#!/usr/bin/env python
"""Analytic FLOP/roofline model of the fused serving engine at any (B, N).

Mirrors the hand accounting in docs/PERF.md ("Roofline" sections) but
parameterized, so the N=512 production shape (and any future bucket) gets
the same speed-of-light treatment as N=256 (VERDICT r3 item 3).  The
counts are derived from the kernel structure in ops/fused.py:

  PLF wide  (_plf_kernel, propagation encoder, pc1): 4 scales
            K=(4,8,16,32), gather base 512-wide, chain 512->256->64.
  CV        (_cv_kernel + _cv_agg_kernel): K=8 both stages; stage-1
            dense 512x512 x2 (first layer offset-folded), WeightNet
            8->8->512 from hi/lo lane-packed offset-projection gathers
            (round-4 fold; wd and wn0 applied outside the kernels).
  MSE       (_mse_kernel, sa encoder, both clouds): 4 scales packed
            block-diagonally (C1c=128), PHASED gather (finished scales
            drop out of the contraction), chain [128,128]+[128,256].
  base builds (make_plf_base / make_mse_base): per-scale feat_tx+xyz@wrel.

One-hot gathers: 1 bf16 MXU pass (2 for f32 hi/lo).  The CV offset
projections gather as ONE hi/lo lane-packed [N,16] operand per k per
stage, lane-padded to 128 — the "MXU-occupied" column counts that
padding, which is why CV utilization trails PLF.  Neighbor kernels (ball/knn) are VPU-bound d^2 work scaling
~B*N^2; they are anchored to measured ms, not modeled.

Usage: python scripts/roofline_serving.py [B N [measured_ms]] ...
Defaults: 64 256 and 32 512, bf16.  PEAK_TFLOPS env overrides 197.
"""
import os
import sys

PEAK = float(os.environ.get("PEAK_TFLOPS", "197")) * 1e12  # v5e bf16 MXU

KS = (4, 8, 16, 32)
C_PLF = 512
PLF_CHAIN = (256, 64)
CV_K = 8
C_CV = 512
C_MSE = 128  # 4 scales x 32, block-diagonally packed
MSE_CHAIN_MAC = 128 * 128 + 128 * 256  # per row-k unit
MSE_OUT_EACH = 64  # mlp2 width per scale


def gflops(x):
    return x * 2 / 1e9  # MAC -> FLOPs, in G


def plf(b, n, f32=False):
    pairs = b * n * sum(KS)
    gather = pairs * n * C_PLF * (2 if f32 else 1)
    dense = pairs * (C_PLF * PLF_CHAIN[0] + PLF_CHAIN[0] * PLF_CHAIN[1])
    return gather, dense, 0


def cv(b, n, f32=False):
    pairs = b * n * CV_K
    passes = 2 if f32 else 1
    gather = pairs * n * C_CV * passes * 2  # stage1 f2 + stage2 p2p
    # offset-projection gathers (round 4 fold): the wd term is folded
    # into f1c/f2c outside the kernel and the WeightNet input arrives
    # as ONE hi/lo lane-packed [N,16] gather per k per stage (was two
    # 128-lane xyz hi/lo passes + in-kernel [.,3] dots)
    z_useful = pairs * n * 16 * 2
    z_occupied = pairs * n * 128 * 2
    dense = pairs * (2 * C_CV * C_CV)  # w1 + w2 (wd folded outside)
    wn = pairs * (16 * 8 + 8 * 8 + 8 * C_CV) * 2  # fold-J + both stages
    return gather + z_useful, dense + wn, z_occupied - z_useful


def mse(b, n, f32=False):
    # phased gather: after scale s's K_s iterations its N rows leave the
    # contraction -> row-k units = sum over k of N*(scales still active)
    row_k = sum((len(KS) - p) * (KS[p] - (KS[p - 1] if p else 0))
                for p in range(len(KS)))  # 4*4 + 3*4 + 2*8 + 1*16 = 60
    gather = row_k * n * b * n * C_MSE * (2 if f32 else 1)
    chain = max(KS) * n * b * MSE_CHAIN_MAC
    return gather * 1, chain, 0


def base_builds(b, n, f32=False):
    # 4 PLF scales [B*N,512]@[515,512]-class + the stacked MSE base
    plf_b = len(KS) * b * n * (C_PLF + 3) * C_PLF
    mse_b = len(KS) * b * n * (3 + 3) * (C_MSE // len(KS))  # tiny
    return 0, plf_b + mse_b, 0


def table(b, n, f32=False, measured_ms=None):
    dt = "f32" if f32 else "bf16"
    per_cloud = {"PLF wide": plf(b, n, f32), "cost volume": cv(b, n, f32),
                 "MSE narrow (x2 clouds)": tuple(
                     2 * x for x in mse(b, n, f32)),
                 "base builds": base_builds(b, n, f32)}
    print(f"\n== B={b} N={n} {dt} ==")
    tot_useful = tot_occ = 0
    for name, (gth, dns, extra_occ) in per_cloud.items():
        useful = gth + dns
        occ = useful + extra_occ
        tot_useful += useful
        tot_occ += occ
        sol = occ * 2 / PEAK * 1e3
        print(f"  {name:24s} gather {gflops(gth):8.1f} GF  "
              f"dense {gflops(dns):8.1f} GF  SOL(occupied) {sol:5.2f} ms")
    sol_tot = tot_occ * 2 / PEAK * 1e3
    print(f"  {'TOTAL MXU':24s} useful {gflops(tot_useful):8.1f} GF  "
          f"occupied {gflops(tot_occ):8.1f} GF  SOL {sol_tot:5.2f} ms")
    if measured_ms:
        util = tot_useful * 2 / (measured_ms / 1e3) / PEAK
        print(f"  measured {measured_ms:.2f} ms -> {util * 100:.0f}% of "
              f"bf16 peak on useful FLOPs "
              f"({tot_occ * 2 / (measured_ms / 1e3) / PEAK * 100:.0f}% "
              "counting pad-occupied)")
    return tot_useful, sol_tot


def main():
    args = sys.argv[1:]
    shapes = []
    while args:
        b, n = int(args[0]), int(args[1])
        ms = float(args[2]) if len(args) > 2 and "." in args[2] else None
        args = args[3 if ms else 2:]
        shapes.append((b, n, ms))
    if not shapes:
        shapes = [(64, 256, 9.10), (32, 512, None)]
    for b, n, ms in shapes:
        table(b, n, f32=False, measured_ms=ms)


if __name__ == "__main__":
    main()
