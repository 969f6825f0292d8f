"""On-chip simulation-based calibration at scale (records the calibration
proof for docs/PARITY.md — round-2 verdict item 3).

R replicate prior-draw -> simulate -> posterior cycles of the MM model run
as ONE fused ensemble program (the batched Lambert-W kernel path), then
chi-square uniformity of the truth's rank among L posterior draws per
dimension (smc_tpu/smc/sbc.py). A calibrated sampler gives uniform ranks;
bias, over/under-dispersion, or a broken kernel each produce a signature
deviation (Talts et al. 2018).

    setsid python benchmarks/sbc_tpu.py > /tmp/sbc_tpu.out 2>&1 &
"""
import json
import time

import jax
import numpy as np

from smc_tpu.config import SMCConfig
from smc_tpu.smc.sbc import rank_chi2, rank_chi2_pvalues, sbc_ranks

R = 256          # replicates
N = 2048         # particles per replicate
L = 127          # rank draws


def main():
    # "exact" jnp path: identical math to the pallas kernel (whose parity
    # is pinned by pallas_onchip_smoke.py); keeps this program's vmap rule
    # simple and the SBC result attributable to the SAMPLER, not the kernel.
    from smc_tpu.smc.sbc import mm_sbc_problem
    prior, simulate, loglik, _ = mm_sbc_problem(method="exact")

    cfg = SMCConfig(n_particles=N)
    t0 = time.perf_counter()
    ranks, thetas, states = sbc_ranks(jax.random.key(0), prior, simulate,
                                      loglik, n_replicates=R, cfg=cfg,
                                      n_rank_draws=L)
    wall = time.perf_counter() - t0
    stats = rank_chi2(ranks, L)
    pvals = rank_chi2_pvalues(ranks, L)
    hist = [np.histogram(ranks[:, j], bins=8, range=(0, L + 1))[0].tolist()
            for j in range(ranks.shape[1])]
    print(json.dumps({
        "replicates": R, "particles": N, "rank_draws": L,
        "wall_s_incl_compile": round(wall, 1),
        "params": ["Vmax", "Km", "sigma"],
        "chi2_stats_df7": [round(float(s), 2) for s in stats],
        "pvalues": [float(f"{p:.4g}") for p in pvals],
        "rank_hist_8bins": hist,
        "calibrated": bool((pvals > 1e-3).all())}), flush=True)


if __name__ == "__main__":
    main()
