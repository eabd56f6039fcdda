"""Kalman filter flavors and mixed-frequency data.

The likelihood is one number, but *how* it is computed is a TPU scheduling
decision.  Four interchangeable filters (``configure(filter_type=...)``):

- ``sequential``    classic scan over time (the default);
- ``parallel``      associative scan — O(log T) depth on many cores;
- ``steady_state``  settle the Riccati recursion, then a constant-gain scan;
- ``stationary``    constant gain *from t=0* with an implicit DARE adjoint —
                    the fastest value+grad path, what NUTS uses.

With periodically-missing data (mixed frequency), ``stationary``
auto-routes to a cyclostationary filter: one frozen gain per phase of the
missingness cycle.

Run:  python examples/06_filters_and_mixed_frequency.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import os

if "GECONPY_PLATFORM" in os.environ:
    # Pin the JAX platform BEFORE first use (plugins may prepend themselves
    # ahead of the JAX_PLATFORMS env var): GECONPY_PLATFORM=cpu python ...
    import jax

    jax.config.update("jax_platforms", os.environ["GECONPY_PLATFORM"])

import jax
import numpy as np

import geconpy_tpu as gt
from geconpy_tpu.stats.statespace import DSGEStateSpace


def main(fast: bool = False):
    model = gt.model_from_gcn(gt.get_example_gcn("rbc_estimation"),
                              verbose=False)

    # ---- 1. The same likelihood under the four filter schedules.
    lls = {}
    for ftype in ["sequential", "parallel", "steady_state", "stationary"]:
        ss_mod = DSGEStateSpace(model)
        ss_mod.configure(observed_states=["Y", "C"],
                         measurement_error=["Y", "C"],
                         filter_type=ftype)
        if not lls:  # simulate once, from the first configuration
            data, draw = ss_mod.data_from_prior(jax.random.PRNGKey(3),
                                                periods=80 if fast else 200)
            u_true = ss_mod.unconstrain(draw)
        logpost = jax.jit(ss_mod.build_logpost(data))
        lls[ftype] = float(logpost(u_true))
    print("log-posterior at the true parameters:")
    for k, v in lls.items():
        print(f"  {k:>12s}: {v:.4f}")
    spread = max(lls.values()) - min(lls.values())
    print(f"  spread across filters: {spread:.2e}  "
          "(steady-state/stationary differ only by the settle transient)")

    # ---- 2. Filtered vs smoothed state paths at a parameter point.
    filt = ss_mod.filter_data(data, params=draw)
    smth = ss_mod.filter_data(data, params=draw, smoother=True)
    print(f"\nfilter loglik {filt.attrs['loglik']:.3f}; "
          f"K path: filtered sd={filt['K'].std():.4f} "
          f"smoothed sd={smth['K'].std():.4f}")

    # ---- 3. Mixed frequency: consumption observed every period, output
    # only every 3rd period as a 3-period sum (e.g. quarterly GDP in a
    # monthly model) — an `aggregate` observation equation plus NaN-padded
    # data.  The missing-data filter handles the NaNs exactly.
    from geconpy_tpu.stats.posterior import prepare_mixed_frequency_data

    ss_mf = DSGEStateSpace(model)
    ss_mf.configure(observed_states=["C", "Y_q"],
                    measurement_error={"C": 0.001, "Y_q": 0.001},
                    aggregate={"Y_q": ("Y", "sum", 3)},
                    filter_type="stationary")
    periods = 81 if fast else 201
    full, draw_mf = ss_mf.data_from_prior(jax.random.PRNGKey(5),
                                          periods=periods)
    # keep C everywhere; keep the aggregated Y_q only at end-of-quarter
    y_q = full[2::3, 1]
    y_grid = prepare_mixed_frequency_data(y_q, period=3,
                                          n_high_freq=periods)
    data_mf = np.column_stack([full[:, 0], y_grid[:, 0]])
    n_missing = int(np.isnan(data_mf).sum())
    print(f"\nmixed-frequency grid: {data_mf.shape}, {n_missing} NaNs")

    logpost_mf = jax.jit(ss_mf.build_logpost(data_mf))
    u_mf = ss_mf.unconstrain(draw_mf)
    print(f"cyclostationary logpost at truth: {float(logpost_mf(u_mf)):.3f}")
    print("(stationary + periodic NaN mask auto-routes to the "
          "cyclostationary filter: one frozen gain per mask phase)")
    return lls


if __name__ == "__main__":
    main(fast="--fast" in sys.argv)
