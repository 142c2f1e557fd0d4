"""Plot the rel-L2 convergence trajectory recorded by bench.py.

Usage: python benchmarks/plot_convergence.py [convergence_d5.json] [out.png]
Produces the trajectory figure used to compare against the JCP paper's
reported convergence behavior (BASELINE.md parity row).
"""

import json
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "convergence_d5.json")
    out = sys.argv[2] if len(sys.argv) > 2 else src.replace(".json", ".png")
    with open(src) as fh:
        data = json.load(fh)
    traj = data["trajectory"]
    fig, ax = plt.subplots(1, 2, figsize=(10, 4))
    ax[0].semilogy(traj["rel_err"], label="relative L2")
    ax[0].axhline(0.01, color="r", ls="--", lw=1, label="1% stop")
    ax[0].set_xlabel("outer iteration")
    ax[0].set_ylabel("relative L2 error")
    ax[0].legend()
    ax[1].plot(traj["loss_u"], lw=0.8)
    ax[1].set_xlabel("outer iteration")
    ax[1].set_ylabel("loss_u")
    ax[1].set_yscale("symlog")
    dev = data.get("device", "?")
    fig.suptitle(f"d=5 cube PDE — {data['iterations']} iters, "
                 f"{data['wall_s']:.1f}s on {dev}")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
