"""Native ssfb loader tests (builds libssfb.so on first run)."""

import numpy as np
import pytest

from ssf_slam_tpu.data.ssfb import (
    SsfbSequence,
    native_available,
    write_ssfb,
)
from ssf_slam_tpu.data.synthetic import generate_sequence

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def seq_file(tmp_path_factory):
    frames = generate_sequence(n_frames=6, n_points=1024, seed=0)
    path = str(tmp_path_factory.mktemp("ssfb") / "seq.ssfb")
    write_ssfb(frames, path)
    return path, frames


def test_roundtrip(seq_file):
    path, frames = seq_file
    s = SsfbSequence(path)
    assert s.n_frames == 6 and s.n_points == 1024
    for i in (0, 3, 5):
        fr = s.frame(i)
        np.testing.assert_array_equal(fr["pos1"], frames[i]["pos1"])
        np.testing.assert_array_equal(fr["gt"], frames[i]["gt"])
        np.testing.assert_array_equal(fr["mask1"],
                                      frames[i]["mask1"].astype(bool))
        assert fr["time"] == pytest.approx(frames[i]["time"])
    s.close()


def test_prefetch_iter_order(seq_file):
    path, frames = seq_file
    s = SsfbSequence(path)
    got = [i for i, _ in s.prefetch_iter()]
    assert got == list(range(6))
    s.close()


def test_zero_copy_view(seq_file):
    path, frames = seq_file
    s = SsfbSequence(path)
    a = s.field(0, "pos1")
    b = s.field(0, "pos1")
    # both views alias the same mmap page
    assert np.shares_memory(
        np.ctypeslib.as_array(a), np.ctypeslib.as_array(b)
    ) or np.array_equal(a, b)
    s.close()


def test_prefetch_iter_twice(seq_file):
    # regression: a second prefetch pass used to assign over a still-joinable
    # std::thread -> std::terminate (SIGABRT of the whole process)
    path, frames = seq_file
    s = SsfbSequence(path)
    first = [i for i, _ in s.prefetch_iter()]
    second = [i for i, _ in s.prefetch_iter()]
    assert first == second == list(range(6))
    s.close()


def test_truncated_file_rejected(seq_file, tmp_path):
    path, frames = seq_file
    blob = open(path, "rb").read()
    bad = tmp_path / "trunc.ssfb"
    bad.write_bytes(blob[: len(blob) // 2])  # header promises more frames
    with pytest.raises(Exception):
        SsfbSequence(str(bad))
    tiny = tmp_path / "tiny.ssfb"
    tiny.write_bytes(blob[:16])  # smaller than the header itself
    with pytest.raises(Exception):
        SsfbSequence(str(tiny))


def test_stripe_reader_matches_per_sequence(tmp_path):
    """Striped multi-stream gather == per-sequence reads, lockstep frames."""
    from ssf_slam_tpu.data.ssfb import SsfbStripe

    seqs, paths = [], []
    for s in range(3):
        frames = generate_sequence(n_frames=5, n_points=512, seed=10 + s)
        p = str(tmp_path / f"s{s}.ssfb")
        write_ssfb(frames, p)
        seqs.append(frames)
        paths.append(p)

    stripe = SsfbStripe(paths, fields=("pos1", "mask1", "time"))
    assert stripe.n_seqs == 3 and stripe.n_frames == 5
    # batches are VIEWS of two rotating buffers (valid for one more step) —
    # consume per iteration, as the streaming engine does
    frames_seen = []
    for f, batch in stripe.batches():
        frames_seen.append(f)
        assert batch["pos1"].shape == (3, 512, 3)
        for s in range(3):
            np.testing.assert_array_equal(
                batch["pos1"][s], np.asarray(seqs[s][f]["pos1"],
                                             np.float32))
            np.testing.assert_array_equal(
                batch["mask1"][s] > 0.5, seqs[s][f]["mask1"])
            assert abs(batch["time"][s, 0] - seqs[s][f]["time"]) < 1e-6
    assert frames_seen == [0, 1, 2, 3, 4]
    # double-buffer contract: a yielded batch stays valid for ONE more step
    it = stripe.batches()
    _, b0 = next(it)
    keep = b0["pos1"].copy()
    next(it)  # fills the other buffer
    np.testing.assert_array_equal(b0["pos1"], keep)
    stripe.close()


def test_stripe_rejects_mismatched_layout(tmp_path):
    from ssf_slam_tpu.data.ssfb import SsfbStripe

    a = str(tmp_path / "a.ssfb")
    b = str(tmp_path / "b.ssfb")
    write_ssfb(generate_sequence(n_frames=2, n_points=256, seed=0), a)
    write_ssfb(generate_sequence(n_frames=2, n_points=512, seed=0), b)
    with pytest.raises(IOError):
        SsfbStripe([a, b])


def _mutate_header(path_in: str, path_out: str, *, dims_swap=None,
                   rename=None, version=None):
    """Byte-patch an ssfb header: <5I (magic, version, n_frames, n_points,
    n_fields) + 8 uint32 field_dims + 8x8 char field_names. Payload is left
    untouched, so a dims SWAP keeps the total floats/frame (and file size)
    valid — the exact shape of file the pre-round-4 stripe_open accepted."""
    import struct

    raw = bytearray(open(path_in, "rb").read())
    if version is not None:
        raw[4:8] = struct.pack("<I", version)
    if dims_swap is not None:
        i, j = dims_swap
        oi, oj = 20 + 4 * i, 20 + 4 * j
        raw[oi:oi + 4], raw[oj:oj + 4] = raw[oj:oj + 4], raw[oi:oi + 4]
    if rename is not None:
        i, name = rename
        o = 20 + 4 * 8 + 8 * i
        raw[o:o + 8] = name.encode().ljust(8, b"\0")[:8]
    open(path_out, "wb").write(bytes(raw))


def test_stripe_rejects_mismatched_field_dims(tmp_path):
    """Same n_points AND n_fields but different per-field dims must fail
    stripe_open: stripe_next sizes its memcpys from each stream's OWN
    field_dims against caller buffers sized from the shared layout, so a
    dim mismatch that passed open would overflow the caller's NumPy
    buffers (heap corruption) instead of failing cleanly (ADVICE r3)."""
    from ssf_slam_tpu.data.ssfb import SsfbStripe

    a = str(tmp_path / "a.ssfb")
    b = str(tmp_path / "b.ssfb")
    write_ssfb(generate_sequence(n_frames=2, n_points=256, seed=0), a)
    # swap dims of pos1 (3) and s_fg_mask (1): counts and file size agree,
    # per-field layout does not
    _mutate_header(a, b, dims_swap=(0, 4))
    with pytest.raises(IOError):
        SsfbStripe([a, b])


def test_stripe_rejects_mismatched_field_names(tmp_path):
    from ssf_slam_tpu.data.ssfb import SsfbStripe

    a = str(tmp_path / "a.ssfb")
    b = str(tmp_path / "b.ssfb")
    write_ssfb(generate_sequence(n_frames=2, n_points=256, seed=0), a)
    _mutate_header(a, b, rename=(1, "pos2x"))
    with pytest.raises(IOError):
        SsfbStripe([a, b])
