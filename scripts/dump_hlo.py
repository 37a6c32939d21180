"""Dump the optimized HLO of the banded TFlow forward and print the text of
named fusions (to attribute trace hotspots). Usage:
    python scripts/dump_hlo.py fusion.3295 fusion.3362 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ssf_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = 8192


def main():
    from ssf_slam_tpu.config import FlowNetConfig
    from ssf_slam_tpu.models import TFlow

    net_cfg = FlowNetConfig(npoint=N, joint_seg=True, dtype="bfloat16",
                            neighbor_backend="banded")
    model = TFlow(cfg=net_cfg)
    rng = jax.random.PRNGKey(0)
    pc = jnp.zeros((1, N, 3))
    variables = jax.jit(model.init)(rng, pc, pc)

    def step(c, s):
        flows, _ = model.apply(variables, s["prev"][None] + c * 1e-7,
                               s["points"][None])
        return c + 1.0, flows[0][0, 0, 0]

    def run(c, sc):
        return jax.lax.scan(step, c, sc)

    scans = dict(points=jnp.zeros((16, N, 3)), prev=jnp.zeros((16, N, 3)))
    txt = (
        jax.jit(run)
        .lower(jnp.float32(0.0), scans)
        .compile()
        .as_text()
    )
    with open("/tmp/hlo.txt", "w") as f:
        f.write(txt)
    print(f"wrote /tmp/hlo.txt ({len(txt)} bytes)")
    targets = [a for a in sys.argv[1:]]
    lines = txt.splitlines()
    for t in targets:
        print(f"\n==== {t}")
        in_block = False
        depth = 0
        for i, ln in enumerate(lines):
            if not in_block and (f" {t} " in ln or ln.strip().startswith(f"%{t} ") or f"%{t}." in ln or f"{t} (" in ln):
                print(ln[:220])
        # also print the fusion computation body if present
        import re
        m = re.search(rf"%fused_computation[^\n]*{re.escape(t)}", txt)


if __name__ == "__main__":
    main()
