"""Analytic FLOP/byte accounting for the training step (VERDICT r3 next #6).

Decouples "is it actually fast" from the assumed A100 baselines: bench.py
reports achieved FLOP/s as a fraction of v5e peak and bytes/s as a fraction
of HBM bandwidth, computed from the algorithmic work of each stage (no
profiler dependency — the counts below mirror the code in
ops/rasterize_tpu.py / ops/binning.py / ops/rasterize.py).

All counts are per TRAINING STEP (one camera, fwd+bwd+losses+Adam) and are
*algorithmic* (useful) work: the MXU's HIGHEST-precision 6-pass f32
emulation and any padding/recompute overhead are intentionally excluded, so
the reported utilization is the fraction of peak spent on useful math — the
roofline number that is comparable across implementations.

Peak constants (published TPU v5e per-chip specs; the VPU figure is
MEASURED on this chip — scripts/vpu_peak.py, 2026-08-20, fused-fma-chain
incremental rate: 2213 G fma/s = 4.43 TF f32, within 15% of the prior
8x128x4-ALU architectural estimate of 3.9. The same run pinned exp at
1327 Gelem/s — ~1.7 fma-equivalents, a hardware
transcendental) and compare+select+mul at 1475 Gelem/s):
  MXU  197 TFLOP/s bf16   (f32-via-HIGHEST ~ 1/6 of that in passes)
  VPU  4.43 TFLOP/s f32 (measured)
  HBM  819 GB/s
"""

from __future__ import annotations

V5E_MXU_BF16_PEAK = 197e12
V5E_MXU_F32_HIGHEST_PEAK = 197e12 / 6.0   # 3+3-pass bf16 emulation of f32
V5E_VPU_F32_PEAK = 4.43e12                # measured (scripts/vpu_peak.py)
V5E_HBM_BYTES_PER_S = 819e9


def step_model(*, entries: int, tile: int, n_tiles: int, f_pad: int,
               g_chunk: int, blk: int, c_acc: int, c_pad: int,
               capacity: int, width: int, height: int,
               sh_degree: int = 3, steps_per_call: int = 1) -> dict:
    """Analytic per-step FLOPs and HBM bytes, split by stage.

    entries: per-camera entry count actually composited (post-truncation).
    Counts assume no early termination (upper bound on kernel work) and one
    lookahead binning per step (the steady-state trainer loop).
    """
    P = tile * tile
    pairs = entries * P                      # (pixel, entry) work items

    # ---- Pallas pair (ops/rasterize_tpu.py) ----
    # fwd per pair: one blockwise triangular cumsum (blk MACs) + the
    # (P,G)x(G,c_acc) feature dot; bwd: two suffix sums + two dots.
    mxu_fwd = pairs * (2 * blk + 2 * c_acc)
    mxu_bwd = pairs * (4 * blk + 4 * c_acc)
    # VPU elementwise per pair (counted from the kernel bodies; exp/log1p
    # counted as one op each): fwd alpha+transmittance+depth+accum ~ 30,
    # bwd alpha+v+u+dalpha+10 reduction products ~ 70.
    vpu_fwd = pairs * 30
    vpu_bwd = pairs * 70
    # kernel HBM traffic: entry rows streamed in (fwd + bwd), per-entry
    # grads written, tile images written (fwd) and re-read twice (bwd takes
    # gout + the forward's saved output).
    tiles_bytes = n_tiles * P * c_pad * 4
    pair_bytes = (2 * entries * f_pad * 4            # fwd+bwd feat reads
                  + entries * f_pad * 4              # grad writes
                  + 4 * tiles_bytes)                 # fwd write + bwd reads

    # ---- entry pipeline (ops/rasterize.py) ----
    # gather: E indices into the (f_pad, capacity) table + dense write; the
    # backward segment-sum re-sorts the grads (perm gather) and cumsums.
    gather_bytes = entries * 4 + 2 * entries * f_pad * 4
    segsum_bytes = 3 * entries * f_pad * 4
    # lookahead binning: histogram keys, one packed-key sort (read+write per
    # merge pass; XLA's sort at E ~ 10^6.5 runs ~log2(E) passes — estimate),
    # gid fill, aux gathers. Dominated by the sort passes.
    import math
    sort_passes = max(1, int(math.log2(max(entries, 2))))
    binning_bytes = (sort_passes * 2 * entries * 8   # packed 8-byte keys
                     + 4 * entries * 4)              # fill + aux
    # ---- per-gaussian stages ----
    proj_flops = capacity * 250                      # EWA + frustum + conic
    sh_flops = capacity * (sh_degree + 1) ** 2 * 3 * 4  # eval + vjp
    adam_flops = capacity * (14 + 3 * (sh_degree + 1) ** 2) * 12
    image_flops = width * height * 400               # loss stack fwd+bwd
    image_bytes = width * height * 4 * 40            # maps + (dis)assembly

    mxu = mxu_fwd + mxu_bwd
    vpu = (vpu_fwd + vpu_bwd + proj_flops + sh_flops + adam_flops
           + image_flops)
    hbm = (pair_bytes + gather_bytes + segsum_bytes + binning_bytes
           + image_bytes + capacity * 60 * 4 * 3)    # params+moments r/w
    return {
        "mxu_flops": float(mxu),
        "vpu_flops": float(vpu),
        "hbm_bytes": float(hbm),
        "by_stage": {
            "pallas_fwd": {"mxu": float(mxu_fwd), "vpu": float(vpu_fwd)},
            "pallas_bwd": {"mxu": float(mxu_bwd), "vpu": float(vpu_bwd)},
            "entry_gather_bytes": float(gather_bytes),
            "entry_segsum_bytes": float(segsum_bytes),
            "binning_bytes": float(binning_bytes),
        },
    }


def utilization(model: dict, step_seconds: float) -> dict:
    """Achieved rates vs v5e peaks for a measured step time."""
    mxu_rate = model["mxu_flops"] / step_seconds
    vpu_rate = model["vpu_flops"] / step_seconds
    hbm_rate = model["hbm_bytes"] / step_seconds
    return {
        "mxu_tflops_achieved": round(mxu_rate / 1e12, 2),
        "mxu_pct_of_bf16_peak": round(100 * mxu_rate / V5E_MXU_BF16_PEAK, 2),
        "mxu_pct_of_f32_highest_peak": round(
            100 * mxu_rate / V5E_MXU_F32_HIGHEST_PEAK, 2),
        "vpu_tflops_achieved": round(vpu_rate / 1e12, 2),
        "vpu_pct_of_peak_measured": round(100 * vpu_rate / V5E_VPU_F32_PEAK, 2),
        "hbm_gb_per_s_achieved": round(hbm_rate / 1e9, 2),
        "hbm_pct_of_peak": round(100 * hbm_rate / V5E_HBM_BYTES_PER_S, 2),
        "note": ("algorithmic work only (no HIGHEST pass multiplier, no "
                 "padding/termination slack); peaks: 197 TF bf16 MXU, "
                 "4.43 TF f32 VPU (measured, scripts/vpu_peak.py), "
                 "819 GB/s HBM (v5e)"),
    }
