"""Dev check (CPU): int8 HisFPN numerics — XLA path vs float folded forward,
and Pallas kernel (interpret) vs the XLA int8 oracle."""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.nn.fpn import HisFPN
from pytorch_object_detection_tpu.nn.fpn_int8 import (
    calibrate_hisfpn,
    hisfpn_int8_forward,
    quantize_hisfpn,
)
from pytorch_object_detection_tpu.nn.fused_fpn import hisfpn_folded_forward

B, HW = 2, (64, 64)  # C3 at /1 of this dev input scale: use direct feats


def main():
    rng = jax.random.PRNGKey(0)
    c3 = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 512), jnp.float32)
    c4 = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 32, 1024), jnp.float32)
    c5 = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 2048), jnp.float32)
    feats = (c3, c4, c5)

    fpn = HisFPN(features=256)
    variables = fpn.init(rng, feats, False)
    params, stats = variables["params"], variables["batch_stats"]

    # float reference
    ref = hisfpn_folded_forward(params, stats, feats, jnp.float32)

    # quantize: backbone outputs as int8 at their own scales
    s_feats = [jnp.max(jnp.abs(f)) / 127.0 for f in feats]
    feats_q = tuple(
        jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8)
        for f, s in zip(feats, s_feats)
    )
    taps = jax.jit(calibrate_hisfpn)(params, stats, feats)
    taps = {k: float(v) for k, v in taps.items()}
    qtree = quantize_hisfpn(params, stats, taps, s_feats)

    lv_xla = hisfpn_int8_forward(qtree, feats_q, jnp.float32, backend="xla")
    for i, (r, q) in enumerate(zip(ref, lv_xla)):
        r = np.asarray(r, np.float32).ravel()
        q = np.asarray(q, np.float32).ravel()
        cos = float(r @ q / (np.linalg.norm(r) * np.linalg.norm(q) + 1e-9))
        rel = float(np.abs(r - q).mean() / (np.abs(r).mean() + 1e-9))
        print(f"P{i+3}: cos={cos:.5f} rel_err={rel:.4f}")

    lvq_xla, sc = hisfpn_int8_forward(qtree, feats_q, backend="xla", dequant=False)
    lvq_pal, _ = hisfpn_int8_forward(qtree, feats_q, backend="pallas", dequant=False,
                                     interpret=True)
    for i, (a, b) in enumerate(zip(lvq_xla, lvq_pal)):
        a, b = np.asarray(a, np.int32), np.asarray(b, np.int32)
        mismatch = (a != b).mean()
        maxd = np.abs(a - b).max()
        print(f"P{i+3}: pallas-vs-xla mismatch={mismatch:.6f} maxdiff={maxd}")


if __name__ == "__main__":
    main()
