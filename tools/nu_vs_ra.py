"""Nu-vs-Ra sweep artifact (the reference README's own RB TODO,
README.md:91): runs the vmapped Rayleigh-number ensemble to steady state and
writes benchmarks/nu_vs_ra.csv (+ .png when matplotlib is available).

Usage: python tools/nu_vs_ra.py [n_steps] [Ra...]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402

from cfd_tpu.parallel.ensemble import make_rb_ensemble  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "benchmarks"


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    ras = [float(x) for x in sys.argv[2:]] or [1e4, 3e4, 1e5, 3e5, 1e6]
    step, states, ras_j, dt, nusselt = make_rb_ensemble(ras)
    for k in range(1, n_steps + 1):
        states, iters, res = step(states, ras_j)
        if k % 4000 == 0:
            nu = nusselt(states, ras_j)
            print(k, ["%.3f" % x for x in np.asarray(nu["nusselt_volume"])],
                  flush=True)
    nu = {k: np.asarray(v) for k, v in nusselt(states, ras_j).items()}
    OUT.mkdir(exist_ok=True)
    csv = OUT / "nu_vs_ra.csv"
    with csv.open("w") as f:
        f.write("rayleigh,nusselt_volume,nusselt_bottom,nusselt_top\n")
        for i, ra in enumerate(ras):
            f.write(f"{ra:g},{nu['nusselt_volume'][i]:.4f},"
                    f"{nu['nusselt_bottom'][i]:.4f},{nu['nusselt_top'][i]:.4f}\n")
    print(f"wrote {csv}")
    # scaling fit: Nu = C * Ra^beta over the convective members
    conv = [i for i, ra in enumerate(ras) if nu["nusselt_volume"][i] > 1.5]
    if len(conv) >= 2:
        lr = np.polyfit(np.log10(np.asarray(ras)[conv]),
                        np.log10(nu["nusselt_volume"][conv]), 1)
        print(f"fit: Nu ~ {10**lr[1]:.3f} * Ra^{lr[0]:.3f}")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 4))
        ax.loglog(ras, nu["nusselt_volume"], "o-", label="Nu (volume)")
        ax.loglog(ras, 0.2 * np.asarray(ras) ** 0.28, "--",
                  label=r"$0.2\,Ra^{0.28}$")
        ax.set_xlabel("Ra")
        ax.set_ylabel("Nu")
        ax.legend()
        fig.tight_layout()
        fig.savefig(OUT / "nu_vs_ra.png", dpi=150)
        print(f"wrote {OUT / 'nu_vs_ra.png'}")
    except ImportError:
        print("matplotlib unavailable; CSV only")


if __name__ == "__main__":
    main()
