// ssfb sequence loader: native host-side IO for the scan feed.
//
// Replaces the host data path of the reference: rospy publishers pacing npz
// reads at 10 Hz (scripts/PointCloudOdometry.py:42-65) and the torch
// DataLoader worker pool (main_sju_occ_ros.py:668-675). Python npz decoding
// is fine for one stream; feeding a TPU at hundreds of scans/sec across many
// parallel sequences needs IO off the interpreter thread — this library
// memory-maps .ssfb sequence files and serves frames through a prefetching
// ring buffer filled by a native reader thread.
//
// File format (.ssfb, little-endian):
//   header:  magic "SSFB" | u32 version | u32 n_frames | u32 n_points |
//            u32 n_fields | 64-byte field names (8 x 8 chars)
//   frames:  n_frames records, each n_fields arrays of n_points float32
//            (xyz fields hold 3 * n_points floats; masks hold n_points)
// Written by ssf_slam_tpu.data.ssfb.write_ssfb.
//
// C ABI (ctypes-friendly):
//   ssfb_open(path) -> handle (or 0)
//   ssfb_info(handle, out_n_frames, out_n_points)
//   ssfb_frame_ptr(handle, frame, field) -> const float*  (mmap'd, zero-copy)
//   ssfb_prefetch_start(handle, start, stride) / ssfb_next(handle) -> frame id
//   ssfb_close(handle)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x42465353;  // "SSFB"
constexpr int kMaxFields = 8;
constexpr int kRing = 8;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t n_frames;
  uint32_t n_points;
  uint32_t n_fields;
  uint32_t field_dims[kMaxFields];  // components per point (3 for xyz, 1 mask)
  char field_names[kMaxFields][8];
};

struct Sequence {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  Header header{};
  size_t frame_bytes = 0;
  size_t field_offset[kMaxFields] = {0};

  // prefetch state: a reader thread touches pages ahead of the consumer so
  // cold (page-cache-miss) frames never stall the feed thread
  std::thread prefetcher;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> cursor{-1};
  int64_t start = 0;
  int64_t stride = 1;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<int64_t> ready;
};

const uint8_t* frame_base(const Sequence* s, int64_t frame) {
  return s->data + sizeof(Header) + frame * s->frame_bytes;
}

void prefetch_loop(Sequence* s) {
  volatile uint8_t sink = 0;
  for (int64_t f = s->start; f < s->header.n_frames && !s->stop.load();
       f += s->stride) {
    // keep at most kRing frames ahead of the consumer
    {
      std::unique_lock<std::mutex> lock(s->mu);
      s->cv.wait(lock, [s, f] {
        return s->stop.load() ||
               f - s->cursor.load() <= kRing;
      });
      if (s->stop.load()) return;
    }
    const uint8_t* base = frame_base(s, f);
    for (size_t off = 0; off < s->frame_bytes; off += 4096) {
      sink ^= base[off];  // fault the page in
    }
    {
      std::lock_guard<std::mutex> lock(s->mu);
      s->ready.push_back(f);
    }
    s->cv.notify_all();
  }
  (void)sink;
}

}  // namespace

extern "C" {

void* ssfb_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  if ((size_t)st.st_size < sizeof(Header)) {
    munmap(mem, st.st_size);
    ::close(fd);
    return nullptr;
  }
  auto* s = new Sequence();
  s->fd = fd;
  s->data = static_cast<const uint8_t*>(mem);
  s->size = st.st_size;
  std::memcpy(&s->header, s->data, sizeof(Header));
  if (s->header.magic != kMagic || s->header.n_fields > kMaxFields) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  size_t off = 0;
  for (uint32_t i = 0; i < s->header.n_fields; ++i) {
    s->field_offset[i] = off;
    off += sizeof(float) * s->header.n_points * s->header.field_dims[i];
  }
  s->frame_bytes = off;
  // reject truncated files: every frame the header promises must be mapped,
  // or ssfb_frame_ptr would hand out pointers past the mapping (SIGSEGV on
  // first read)
  if (s->size < sizeof(Header) + (size_t)s->header.n_frames * s->frame_bytes) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  return s;
}

void ssfb_info(void* handle, uint32_t* n_frames, uint32_t* n_points,
               uint32_t* n_fields) {
  auto* s = static_cast<Sequence*>(handle);
  *n_frames = s->header.n_frames;
  *n_points = s->header.n_points;
  *n_fields = s->header.n_fields;
}

int ssfb_field_index(void* handle, const char* name) {
  auto* s = static_cast<Sequence*>(handle);
  for (uint32_t i = 0; i < s->header.n_fields; ++i) {
    if (strncmp(s->header.field_names[i], name, 8) == 0) return (int)i;
  }
  return -1;
}

uint32_t ssfb_field_dim(void* handle, int field) {
  auto* s = static_cast<Sequence*>(handle);
  return s->header.field_dims[field];
}

const float* ssfb_frame_ptr(void* handle, int64_t frame, int field) {
  auto* s = static_cast<Sequence*>(handle);
  if (frame < 0 || frame >= s->header.n_frames) return nullptr;
  return reinterpret_cast<const float*>(frame_base(s, frame) +
                                        s->field_offset[field]);
}

void ssfb_prefetch_start(void* handle, int64_t start, int64_t stride) {
  auto* s = static_cast<Sequence*>(handle);
  // a second pass over the same sequence re-enters here with the previous
  // prefetcher possibly still joinable; assigning over a joinable
  // std::thread calls std::terminate — stop and join it first
  if (s->prefetcher.joinable()) {
    s->stop.store(true);
    s->cv.notify_all();
    s->prefetcher.join();
  }
  s->start = start;
  s->stride = stride > 0 ? stride : 1;
  s->cursor.store(start - 1);
  s->stop.store(false);
  s->ready.clear();
  s->prefetcher = std::thread(prefetch_loop, s);
}

// blocks until the next prefetched frame is resident; returns its index or
// -1 at end of sequence
int64_t ssfb_next(void* handle) {
  auto* s = static_cast<Sequence*>(handle);
  std::unique_lock<std::mutex> lock(s->mu);
  s->cv.wait(lock, [s] {
    return !s->ready.empty() ||
           s->cursor.load() + s->stride >= (int64_t)s->header.n_frames;
  });
  if (s->ready.empty()) return -1;
  int64_t f = s->ready.front();
  s->ready.erase(s->ready.begin());
  s->cursor.store(f);
  s->cv.notify_all();
  return f;
}

void ssfb_close(void* handle) {
  auto* s = static_cast<Sequence*>(handle);
  s->stop.store(true);
  s->cv.notify_all();
  if (s->prefetcher.joinable()) s->prefetcher.join();
  munmap(const_cast<uint8_t*>(s->data), s->size);
  ::close(s->fd);
  delete s;
}

// ---------------------------------------------------------------------------
// striped multi-sequence reader: one stream per device for the shard_map
// multi-sequence engine (parallel/mesh.py). Each stream keeps its own
// prefetch thread; ssfb_stripe_next gathers frame f of every stream into
// caller-provided batch buffers ([n_seqs, n_points, dim] row-major), so the
// Python feed thread does ONE ctypes call per scan step (GIL released for
// the whole page-wait + memcpy) and hands jax a ready [S, ...] block.
// ---------------------------------------------------------------------------

namespace {

struct Stripe {
  std::vector<Sequence*> seqs;
  uint32_t n_frames_min = 0;
};

}  // namespace

void* ssfb_stripe_open(const char* const* paths, int n_seqs) {
  if (n_seqs <= 0) return nullptr;
  auto* st = new Stripe();
  for (int i = 0; i < n_seqs; ++i) {
    void* h = ssfb_open(paths[i]);
    if (h == nullptr) {
      for (auto* s : st->seqs) ssfb_close(s);
      delete st;
      return nullptr;
    }
    st->seqs.push_back(static_cast<Sequence*>(h));
  }
  // streams must agree on layout (one compiled step shape serves all).
  // The FULL layout is compared — version, field_dims[], field_names[] —
  // not just the counts: ssfb_stripe_next sizes its memcpy from each
  // stream's own field_dims against caller buffers sized from stream 0's,
  // so a dim mismatch that passed open would overflow the caller's NumPy
  // buffers instead of failing cleanly here.
  const Header& h0 = st->seqs[0]->header;
  st->n_frames_min = h0.n_frames;
  for (auto* s : st->seqs) {
    const Header& h = s->header;
    if (h.version != h0.version || h.n_points != h0.n_points ||
        h.n_fields != h0.n_fields ||
        std::memcmp(h.field_dims, h0.field_dims, sizeof(h0.field_dims)) != 0 ||
        std::memcmp(h.field_names, h0.field_names,
                    sizeof(h0.field_names)) != 0) {
      for (auto* q : st->seqs) ssfb_close(q);
      delete st;
      return nullptr;
    }
    if (h.n_frames < st->n_frames_min) st->n_frames_min = h.n_frames;
  }
  return st;
}

void ssfb_stripe_info(void* handle, uint32_t* n_frames, uint32_t* n_points,
                      uint32_t* n_fields) {
  auto* st = static_cast<Stripe*>(handle);
  *n_frames = st->n_frames_min;
  *n_points = st->seqs[0]->header.n_points;
  *n_fields = st->seqs[0]->header.n_fields;
}

int ssfb_stripe_field_index(void* handle, const char* name) {
  auto* st = static_cast<Stripe*>(handle);
  return ssfb_field_index(st->seqs[0], name);
}

void ssfb_stripe_start(void* handle, int64_t start, int64_t stride) {
  auto* st = static_cast<Stripe*>(handle);
  for (auto* s : st->seqs) ssfb_prefetch_start(s, start, stride);
}

// Blocks until frame f is page-resident in EVERY stream, then scatters each
// stream's requested fields into outs[j] + i * field_floats (i = stream,
// j = field). All streams share (start, stride), so their ssfb_next cursors
// advance in lockstep. Returns the frame index, or -1 past the shortest
// stream.
int64_t ssfb_stripe_next(void* handle, const int* fields, int n_req,
                         float* const* outs) {
  auto* st = static_cast<Stripe*>(handle);
  int64_t f = -1;
  for (size_t i = 0; i < st->seqs.size(); ++i) {
    Sequence* s = st->seqs[i];
    int64_t fi = ssfb_next(s);
    if (fi < 0 || fi >= (int64_t)st->n_frames_min) return -1;
    if (f < 0) f = fi;
    // lockstep contract: same (start, stride) => same frame everywhere
    if (fi != f) return -2;
    for (int j = 0; j < n_req; ++j) {
      const float* src = ssfb_frame_ptr(s, fi, fields[j]);
      size_t floats =
          (size_t)s->header.n_points * s->header.field_dims[fields[j]];
      std::memcpy(outs[j] + i * floats, src, floats * sizeof(float));
    }
  }
  return f;
}

void ssfb_stripe_close(void* handle) {
  auto* st = static_cast<Stripe*>(handle);
  for (auto* s : st->seqs) ssfb_close(s);
  delete st;
}

}  // extern "C"
