"""Matplotlib plotting layer.

Role parity with ``gEconpy/plotting.py`` (plot_timeseries:149,
plot_simulation:202, plot_irf:393,
plot_solvability:573, plot_eigenvalues:689, plot_covariance_matrix:1138,
plot_heatmap:1204, plot_acf:1454, plot_corner:1680, plot_kalman_filter:1788,
plot_priors:1876, plot_posterior_with_prior:1932, plot_estimated_matrix:1979,
gridspec helper :46).  Host-side presentation only; all imports are lazy so
the compute stack never requires matplotlib.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "prepare_gridspec_figure",
    "plot_timeseries",
    "plot_simulation",
    "plot_irf",
    "plot_eigenvalues",
    "plot_solvability",
    "plot_solvability_summary",
    "plot_covariance_matrix",
    "plot_heatmap",
    "plot_acf",
    "plot_corner",
    "plot_kalman_filter",
    "plot_priors",
    "plot_posterior_with_prior",
    "plot_estimated_matrix",
    "plot_eigenvalue_sensitivity",
    "plot_perfect_foresight",
    "plot_shock_decomposition",
    "plot_forecast",
]


def _plt():
    import matplotlib.pyplot as plt

    return plt


def prepare_gridspec_figure(n_plots: int, n_cols: int = 3, figsize=None,
                            sharex: bool = False, sharey: bool = False,
                            suptitle: str | None = None, **fig_kwargs):
    """Figure + axes grid sized for ``n_plots`` panels.

    ``sharex``/``sharey`` share the axes across panels (role parity with the
    reference's gridspec helper, ``gEconpy/plotting.py:46``); surplus panels
    are hidden, and with ``sharex`` the x tick labels stay visible on the
    last occupied panel of each column."""
    plt = _plt()
    n_rows = -(-n_plots // n_cols)
    if figsize is None:
        figsize = (4 * n_cols, 2.6 * n_rows)
    fig, axes = plt.subplots(n_rows, n_cols, figsize=figsize, squeeze=False,
                             sharex=sharex, sharey=sharey, **fig_kwargs)
    flat = axes.ravel()
    for idx in range(n_plots, len(flat)):
        flat[idx].set_visible(False)
        if sharex and idx >= n_cols:
            # re-enable tick labels on the panel above the hidden one
            flat[idx - n_cols].tick_params(labelbottom=True)
    if suptitle:
        fig.suptitle(suptitle)
    return fig, flat[:n_plots]


def _hdi_band(draws_2d: np.ndarray, ci: float):
    """(lo, hi) equal-tailed interval across axis 0."""
    lo_q, hi_q = (1 - ci) / 2, 1 - (1 - ci) / 2
    return (np.quantile(draws_2d, lo_q, axis=0),
            np.quantile(draws_2d, hi_q, axis=0))


def plot_timeseries(df, variables=None, n_cols: int | None = None,
                    fig_kwargs: dict | None = None, sharex: bool = True,
                    **line_kwargs):
    """One panel per column of a plain time-series DataFrame — role parity
    with ``gEconpy/plotting.py:149`` (plot_timeseries).

    ``df``'s index is the time axis (integers or dates both work; a
    DatetimeIndex gets year-major date ticks like the reference).  Extra
    ``line_kwargs`` pass through to ``Axes.plot``."""
    import pandas as pd

    variables = list(variables) if variables is not None else list(df.columns)
    if n_cols is None:
        n_cols = min(4, len(variables))
    fig, axes = prepare_gridspec_figure(len(variables), n_cols, sharex=sharex,
                                        **(fig_kwargs or {}))
    is_dates = isinstance(df.index, pd.DatetimeIndex)
    for ax, var in zip(axes, variables):
        ax.plot(df.index, df[var].values, **line_kwargs)
        ax.set_title(var)
        if is_dates:
            from matplotlib.dates import DateFormatter, YearLocator

            span_years = max(1, (df.index[-1] - df.index[0]).days // 365)
            ax.xaxis.set_major_locator(YearLocator(max(1, span_years // 6)))
            ax.xaxis.set_major_formatter(DateFormatter("%Y"))
    fig.tight_layout()
    return fig


def plot_simulation(simulation_df, variables=None, n_cols: int = 3,
                    alpha: float = 0.3, ci: float = 0.9,
                    n_paths: int = 0, sharex: bool = True):
    """Fan chart of simulated paths: per-variable quantile band + mean,
    optionally overlaying ``n_paths`` individual trajectories (spaghetti) —
    role parity with ``gEconpy/plotting.py:202``."""
    variables = variables or list(simulation_df.columns)
    fig, axes = prepare_gridspec_figure(len(variables), n_cols, sharex=sharex)
    grouped = simulation_df.groupby(level="time")
    lo_q, hi_q = (1 - ci) / 2, 1 - (1 - ci) / 2
    sims = simulation_df.index.get_level_values("simulation").unique() \
        if "simulation" in (simulation_df.index.names or ()) else []
    for ax, var in zip(axes, variables):
        mean = grouped[var].mean()
        lo = grouped[var].quantile(lo_q)
        hi = grouped[var].quantile(hi_q)
        ax.fill_between(mean.index, lo, hi, alpha=alpha)
        for s in list(sims)[:n_paths]:
            path = simulation_df.xs(s, level="simulation")[var]
            ax.plot(path.index, path.values, lw=0.5, alpha=0.5, color="gray")
        ax.plot(mean.index, mean.values, lw=1.5)
        ax.set_title(var)
        ax.axhline(0.0, color="k", lw=0.5, ls=":")
    fig.tight_layout()
    return fig


def plot_irf(irf_df, variables=None, shocks=None, n_cols: int = 3,
             legend: bool = True, ci: float | None = 0.9,
             group_by: str = "variable", cumulative: bool = False,
             sharex: bool = True):
    """IRF panels (role parity with ``gEconpy/plotting.py:393``).

    - point IRFs: MultiIndex (shock, time) — one line per shock.
    - posterior IRFs: MultiIndex (draw, shock, time) — median line with the
      ``ci`` equal-tailed HDI band per shock.
    - ``group_by``: 'variable' (panel per variable, line per shock) or
      'shock' (panel per shock, line per variable).
    - ``cumulative``: plot cumulated responses (flow -> level).
    """
    posterior = "variable" in (irf_df.index.names or ()) \
        and "mean" in irf_df.columns
    if posterior:
        variables = variables or list(
            irf_df.index.get_level_values("variable").unique())
    else:
        variables = variables or list(irf_df.columns)
    shocks = shocks or list(irf_df.index.get_level_values("shock").unique())

    if group_by not in ("variable", "shock"):
        raise ValueError("group_by must be 'variable' or 'shock'")
    panels = variables if group_by == "variable" else shocks
    lines = shocks if group_by == "variable" else variables
    fig, axes = prepare_gridspec_figure(len(panels), n_cols, sharex=sharex)

    qcols = sorted(c for c in getattr(irf_df, "columns", ())
                   if str(c).startswith("q"))

    for ax, panel in zip(axes, panels):
        for li, line in enumerate(lines):
            var = panel if group_by == "variable" else line
            shock = line if group_by == "variable" else panel
            if posterior:
                sub = irf_df.xs((shock, var), level=("shock", "variable"))
                center = sub["q0.5"] if "q0.5" in sub else sub["mean"]
                t = np.asarray(sub.index)
                vals = center.to_numpy()
                if cumulative:
                    vals = np.cumsum(vals)
                ax.plot(t, vals, label=str(line), color=f"C{li}")
                if ci and len(qcols) >= 2:
                    lo = sub[qcols[0]].to_numpy()
                    hi = sub[qcols[-1]].to_numpy()
                    if cumulative:
                        lo, hi = np.cumsum(lo), np.cumsum(hi)
                    ax.fill_between(t, lo, hi, alpha=0.25, color=f"C{li}")
            else:
                sub = irf_df.xs(shock, level="shock")[var]
                vals = sub.to_numpy()
                if cumulative:
                    vals = np.cumsum(vals)
                ax.plot(sub.index, vals, label=str(line), color=f"C{li}")
        ax.set_title(str(panel))
        ax.axhline(0.0, color="k", lw=0.5, ls=":")
    if legend and len(lines) > 1:
        axes[0].legend(fontsize=8)
    fig.tight_layout()
    return fig


def plot_eigenvalues(bk_table, ax=None, annotate_near: float = 0.15):
    """Unit-circle eigenvalue plot from Model.check_bk_condition output.

    Stable roots plot in blue, unstable in red; roots within
    ``annotate_near`` of the unit circle get their modulus annotated
    (they decide BK by a hair)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(5, 5))
    theta = np.linspace(0, 2 * np.pi, 200)
    ax.plot(np.cos(theta), np.sin(theta), "k--", lw=0.7)
    finite = np.isfinite(bk_table["modulus"])
    mod = np.asarray(bk_table["modulus"][finite], dtype=float)
    re = np.asarray(bk_table["real"][finite], dtype=float)
    im = np.asarray(bk_table["imag"][finite], dtype=float)
    stable = mod < 1.0
    ax.scatter(re[stable], im[stable], s=25, c="C0", label="stable")
    if (~stable).any():
        ax.scatter(re[~stable], im[~stable], s=25, c="C3", label="unstable")
    for r, i, m in zip(re, im, mod):
        if abs(m - 1.0) < annotate_near:
            ax.annotate(f"{m:.3f}", (r, i), fontsize=7,
                        xytext=(3, 3), textcoords="offset points")
    n_inf = int((~finite).sum())
    title = "Generalized eigenvalues"
    if n_inf:
        title += f" ({n_inf} infinite not shown)"
    ax.set_title(title)
    ax.set_xlabel("Re")
    ax.set_ylabel("Im")
    ax.set_aspect("equal")
    ax.legend(fontsize=7, loc="upper right")
    return ax


def plot_solvability(solvability_df, params=None, figsize=None):
    """Pairwise scatter of parameter draws colored by solvability."""
    plt = _plt()
    params = params or [c for c in solvability_df.columns
                        if c not in ("success", "failure_stage",
                                     "spectral_radius", "deterministic_norm",
                                     "stochastic_norm") and
                        solvability_df[c].dtype.kind == "f"]
    k = len(params)
    fig, axes = plt.subplots(k, k, figsize=figsize or (2.2 * k, 2.2 * k),
                             squeeze=False)
    ok = solvability_df["success"].to_numpy()
    for i, pi in enumerate(params):
        for j, pj in enumerate(params):
            ax = axes[i][j]
            if i == j:
                ax.hist([solvability_df[pi][ok], solvability_df[pi][~ok]],
                        bins=15, stacked=True, color=["C0", "C3"])
            else:
                ax.scatter(solvability_df[pj][ok], solvability_df[pi][ok],
                           s=4, c="C0", label="ok")
                ax.scatter(solvability_df[pj][~ok], solvability_df[pi][~ok],
                           s=6, c="C3", label="fail")
            if i == k - 1:
                ax.set_xlabel(pj, fontsize=8)
            if j == 0:
                ax.set_ylabel(pi, fontsize=8)
    fig.tight_layout()
    return fig


def plot_solvability_summary(solvability_df, ax=None):
    """Bar chart of failure-stage attribution."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 3))
    counts = solvability_df["failure_stage"].value_counts()
    counts.plot.bar(ax=ax)
    ax.set_ylabel("draws")
    ax.set_title("Solvability by failure stage")
    return ax


def plot_heatmap(df, ax=None, cmap="RdBu_r", annotate: bool = True,
                 fmt: str = "{:.2f}"):
    """Annotated heatmap of a labeled matrix DataFrame."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(0.6 * len(df.columns) + 2,
                                      0.5 * len(df.index) + 1.5))
    values = df.to_numpy(dtype=float)
    vmax = np.nanmax(np.abs(values)) or 1.0
    im = ax.imshow(values, cmap=cmap, vmin=-vmax, vmax=vmax)
    ax.set_xticks(range(len(df.columns)), df.columns, rotation=90, fontsize=8)
    ax.set_yticks(range(len(df.index)),
                  [str(i) for i in df.index], fontsize=8)
    if annotate and values.size <= 400:
        for i in range(values.shape[0]):
            for j in range(values.shape[1]):
                ax.text(j, i, fmt.format(values[i, j]), ha="center",
                        va="center", fontsize=7)
    plt.colorbar(im, ax=ax, shrink=0.8)
    return ax


def plot_covariance_matrix(cov_df, ax=None, **kwargs):
    return plot_heatmap(cov_df, ax=ax, **kwargs)


def plot_estimated_matrix(posterior_matrices, index=None, columns=None,
                          n_cols: int = 4):
    """Posterior distribution per matrix entry (draws, n, m) as histograms."""
    arr = np.asarray(posterior_matrices)
    _, n, m = arr.shape
    fig, axes = prepare_gridspec_figure(n * m, n_cols)
    for idx, ax in enumerate(axes):
        i, j = divmod(idx, m)
        ax.hist(arr[:, i, j], bins=30, density=True)
        ri = index[i] if index is not None else i
        cj = columns[j] if columns is not None else j
        ax.set_title(f"[{ri}, {cj}]", fontsize=8)
    fig.tight_layout()
    return fig


def plot_acf(acf_df, variables=None, n_cols: int = 3, ci: float | None = 0.9,
             n_obs: int | None = None):
    """Autocorrelation-function panels (role parity with
    ``gEconpy/plotting.py:1454``).

    - point ACF: MultiIndex (lag, variable) — bar per lag.
    - posterior ACF: MultiIndex (draw, lag, variable) — posterior-median
      bars with ``ci`` HDI whiskers per lag.
    - ``n_obs``: draw the ±1.96/√T white-noise significance band.
    """
    posterior = "variable" in (acf_df.index.names or ()) \
        and "mean" in getattr(acf_df, "columns", ())
    if posterior:
        variables = variables or list(
            acf_df.index.get_level_values("variable").unique())
    else:
        variables = variables or list(acf_df.columns)
    fig, axes = prepare_gridspec_figure(len(variables), n_cols, sharey=True)
    lags = np.asarray(sorted(acf_df.index.get_level_values("lag").unique()))
    qcols = sorted(c for c in getattr(acf_df, "columns", ())
                   if str(c).startswith("q"))
    for ax, var in zip(axes, variables):
        if posterior:
            sub = acf_df.xs(var, level="variable")
            med = (sub["q0.5"] if "q0.5" in sub else sub["mean"]).to_numpy()
            ax.bar(lags, med, width=0.3)
            if ci and len(qcols) >= 2:
                lo = sub[qcols[0]].to_numpy()
                hi = sub[qcols[-1]].to_numpy()
                ax.errorbar(lags, med, yerr=[med - lo, hi - med], fmt="none",
                            ecolor="k", elinewidth=0.8, capsize=2)
        else:
            values = [acf_df.loc[(lag, var), var] for lag in lags]
            ax.bar(lags, values, width=0.3)
        if n_obs:
            band = 1.96 / np.sqrt(n_obs)
            ax.axhspan(-band, band, color="gray", alpha=0.15)
        ax.set_title(var)
        ax.set_ylim(-1.05, 1.05)
        ax.axhline(0.0, color="k", lw=0.5)
    fig.tight_layout()
    return fig


def plot_corner(samples, names=None, figsize=None, truths: dict | None = None):
    """Corner (pairs) plot of posterior draws (chains, draws, dim), with
    optional true-value crosshairs (role parity with
    ``gEconpy/plotting.py:1680``)."""
    plt = _plt()
    arr = np.asarray(samples)
    if arr.ndim == 3:
        arr = arr.reshape(-1, arr.shape[-1])
    d = arr.shape[1]
    names = names or [f"x{i}" for i in range(d)]
    truth_vals = [truths.get(n) if truths else None for n in names]
    fig, axes = plt.subplots(d, d, figsize=figsize or (2 * d, 2 * d),
                             squeeze=False)
    for i in range(d):
        for j in range(d):
            ax = axes[i][j]
            if j > i:
                ax.set_visible(False)
            elif i == j:
                ax.hist(arr[:, i], bins=40, density=True)
                if truth_vals[i] is not None:
                    ax.axvline(truth_vals[i], color="C3", lw=1.2, ls="--")
            else:
                ax.hist2d(arr[:, j], arr[:, i], bins=40)
                if truth_vals[j] is not None:
                    ax.axvline(truth_vals[j], color="C3", lw=0.9, ls="--")
                if truth_vals[i] is not None:
                    ax.axhline(truth_vals[i], color="C3", lw=0.9, ls="--")
            if i == d - 1:
                ax.set_xlabel(names[j], fontsize=8)
            if j == 0:
                ax.set_ylabel(names[i], fontsize=8)
    fig.tight_layout()
    return fig


def plot_kalman_filter(filter_result, data=None, state_names=None,
                       kind: str | tuple = "filtered", n_cols: int = 3,
                       observed_idx=None, n_sd: float = 1.0):
    """State paths with ±``n_sd``·σ bands (role parity with
    ``gEconpy/plotting.py:1788``).

    ``kind`` may be one name or several ('filtered', 'predicted',
    'smoothed') overlaid per panel; ``data`` (periods, k_obs) with
    ``observed_idx`` (state column per observable) scatters the
    observations onto the matching state panels."""
    kinds = (kind,) if isinstance(kind, str) else tuple(kind)
    mean0 = np.asarray(getattr(filter_result, f"{kinds[0]}_mean"))
    n = mean0.shape[1]
    state_names = list(state_names) if state_names is not None \
        else [f"state {i}" for i in range(n)]
    fig, axes = prepare_gridspec_figure(n, n_cols, sharex=True)
    t = np.arange(mean0.shape[0])
    for i, ax in enumerate(axes):
        for ki, kname in enumerate(kinds):
            mean = np.asarray(getattr(filter_result, f"{kname}_mean"))
            cov = np.asarray(getattr(filter_result, f"{kname}_cov"))
            sd = n_sd * np.sqrt(np.maximum(cov[:, i, i], 0))
            ax.fill_between(t, mean[:, i] - sd, mean[:, i] + sd, alpha=0.25,
                            color=f"C{ki}")
            ax.plot(t, mean[:, i], lw=1.2, color=f"C{ki}", label=kname)
        if data is not None and observed_idx is not None:
            for j, state_col in enumerate(observed_idx):
                if state_col == i:
                    ax.scatter(t, np.asarray(data)[:, j], s=6, c="k",
                               zorder=3, label="observed")
        ax.set_title(state_names[i])
    if len(kinds) > 1 or (data is not None and observed_idx is not None):
        axes[0].legend(fontsize=7)
    fig.tight_layout()
    return fig


def plot_priors(priors: dict, n_cols: int = 3, n_points: int = 300):
    """Prior density panels from a {name: Distribution} dict."""
    fig, axes = prepare_gridspec_figure(len(priors), n_cols)
    for ax, (name, dist) in zip(axes, priors.items()):
        lo, hi = dist.hdi(0.995)
        xs = np.linspace(lo, hi, n_points)
        import jax.numpy as jnp

        ys = np.exp(np.asarray(dist.logpdf(jnp.asarray(xs))))
        ax.plot(xs, ys)
        ax.set_title(name)
    fig.tight_layout()
    return fig


def plot_posterior_with_prior(result, priors: dict, n_cols: int = 3,
                              n_points: int = 300, true_values: dict | None = None,
                              per_chain: bool = False):
    """Posterior histograms overlaid with prior densities (role parity with
    ``gEconpy/plotting.py:1932``).

    ``true_values`` marks known values (simulation studies) as vertical
    lines; ``per_chain`` overlays a translucent histogram per chain so
    between-chain disagreement (bad mixing) is visible."""
    import jax.numpy as jnp

    names = result.param_names
    fig, axes = prepare_gridspec_figure(len(names), n_cols)
    samples = np.asarray(result.samples)
    flat = samples.reshape(-1, len(names))
    for i, (ax, name) in enumerate(zip(axes, names)):
        if per_chain and samples.ndim == 3:
            for c in range(samples.shape[0]):
                ax.hist(samples[c, :, i], bins=30, density=True, alpha=0.35,
                        histtype="stepfilled")
        else:
            ax.hist(flat[:, i], bins=40, density=True, alpha=0.6,
                    label="posterior")
        if name in priors:
            lo, hi = priors[name].hdi(0.995)
            xs = np.linspace(lo, hi, n_points)
            ys = np.exp(np.asarray(priors[name].logpdf(jnp.asarray(xs))))
            ax.plot(xs, ys, "k-", lw=1.2, label="prior")
        if true_values and name in true_values:
            ax.axvline(true_values[name], color="C3", lw=1.4, ls="--",
                       label="true")
        # posterior mean marker
        ax.axvline(flat[:, i].mean(), color="C0", lw=1.0, ls=":")
        ax.set_title(name)
    axes[0].legend(fontsize=8)
    fig.tight_layout()
    return fig


def plot_eigenvalue_sensitivity(sensitivity_df, ax=None, n_eigs: int = 6):
    """Bar panel of eigenvalue sensitivities.

    Accepts either the per-eigenvalue table from
    ``eigenvalue_sensitivity`` (plots d|λ|/dθ for the ``n_eigs``
    eigenvalues closest to the unit circle) or the single-row
    ``spectral_radius_sensitivity`` frame."""
    plt = _plt()
    if "d_rho_d_param" in getattr(sensitivity_df, "columns", ()):
        if ax is None:
            _, ax = plt.subplots(figsize=(6, 3))
        sensitivity_df["d_rho_d_param"].plot.bar(ax=ax)
        ax.set_ylabel(r"$\partial \rho(T) / \partial \theta$")
        ax.axhline(0, color="k", lw=0.5)
        return ax
    import numpy as _np

    mod = sensitivity_df.attrs.get("modulus")
    dmod = sensitivity_df.xs("modulus", level="part")
    if mod is not None:
        order = _np.argsort(_np.abs(_np.asarray(mod) - 1.0))[:n_eigs]
    else:
        order = dmod.index[:n_eigs]
    if ax is None:
        _, ax = plt.subplots(figsize=(7, 3.2))
    sub = dmod.loc[list(order)]
    sub.T.plot.bar(ax=ax)
    ax.set_ylabel(r"$\partial |\lambda| / \partial \theta$")
    ax.axhline(0, color="k", lw=0.5)
    ax.legend(title="eigenvalue", fontsize=7)
    return ax


def plot_perfect_foresight(result, variables=None, n_cols: int = 3):
    """Trajectory panels with the terminal steady state marked."""
    traj = result.trajectory
    variables = variables or list(traj.columns)
    fig, axes = prepare_gridspec_figure(len(variables), n_cols)
    for ax, var in zip(axes, variables):
        ax.plot(traj.index, traj[var], lw=1.3)
        ax.axhline(traj[var].iloc[-1], color="k", lw=0.6, ls=":")
        ax.set_title(var)
    fig.tight_layout()
    return fig


def plot_shock_decomposition(decomposition_df, variables=None,
                             n_cols: int = 2):
    """Stacked-bar historical shock decomposition (the classic Dynare
    ``shock_decomposition`` panel; no reference counterpart).

    ``decomposition_df`` comes from
    :func:`geconpy_tpu.stats.posterior.historical_shock_decomposition`:
    indexed (time, variable) with one column per shock plus ``initial`` and
    ``smoothed``.  Per variable, positive and negative contributions stack
    above/below zero and the smoothed total overlays as a line.
    """
    plt = _plt()
    all_vars = decomposition_df.index.get_level_values("variable").unique()
    variables = list(variables) if variables is not None else list(all_vars)
    shock_cols = [c for c in decomposition_df.columns
                  if c not in ("smoothed",)]

    fig, axes = prepare_gridspec_figure(len(variables), n_cols, sharex=True)
    cmap = plt.get_cmap("tab10")
    for ax, var in zip(axes, variables):
        block = decomposition_df.xs(var, level="variable")
        t = np.asarray(block.index)
        pos_base = np.zeros(len(t))
        neg_base = np.zeros(len(t))
        for j, col in enumerate(shock_cols):
            vals = block[col].to_numpy()
            pos = np.where(vals > 0, vals, 0.0)
            neg = np.where(vals < 0, vals, 0.0)
            color = cmap(j % 10)
            ax.bar(t, pos, bottom=pos_base, width=1.0, color=color,
                   label=col, linewidth=0)
            ax.bar(t, neg, bottom=neg_base, width=1.0, color=color,
                   linewidth=0)
            pos_base = pos_base + pos
            neg_base = neg_base + neg
        ax.plot(t, block["smoothed"].to_numpy(), color="black", lw=1.2,
                label="smoothed")
        ax.axhline(0.0, color="black", lw=0.5)
        ax.set_title(var)
    axes[0].legend(fontsize=7, ncol=2)
    fig.tight_layout()
    return fig


def plot_forecast(forecast_df, data=None, observed_names=None,
                  history: int = 40, n_cols: int = 2):
    """Fan chart: history + forecast quantile bands per observable.

    ``forecast_df`` comes from :func:`geconpy_tpu.stats.forecast.
    posterior_forecast` or ``conditional_forecast`` — indexed
    (variable, time 1..H) with ``mean`` and ``q*`` columns.  Pass the
    estimation ``data`` (and its column order in ``observed_names``) to
    draw the last ``history`` observations before the forecast origin.
    Nested quantile pairs shade progressively (outermost lightest).
    """
    plt = _plt()
    variables = list(forecast_df.index.get_level_values("variable").unique())
    qcols = sorted([c for c in forecast_df.columns if c.startswith("q")],
                   key=lambda c: float(c[1:]))
    pairs = [(qcols[i], qcols[-1 - i]) for i in range(len(qcols) // 2)]

    fig, axes = prepare_gridspec_figure(len(variables), n_cols, sharex=True)
    for ax, var in zip(axes, variables):
        block = forecast_df.xs(var, level="variable")
        t_fc = np.asarray(block.index, dtype=float)
        if data is not None:
            names = list(observed_names) if observed_names is not None \
                else variables
            if var in names:
                col = np.asarray(data)[:, names.index(var)]
                h = col[-history:] if history else col
                t_hist = np.arange(-len(h) + 1, 1, dtype=float)
                ax.plot(t_hist, h, color="black", lw=1.0)
                ax.axvline(0.0, color="grey", lw=0.7, ls=":")
        for k, (lo, hi) in enumerate(pairs):
            ax.fill_between(t_fc, block[lo].to_numpy(),
                            block[hi].to_numpy(),
                            alpha=0.25 + 0.15 * k, color="C0", lw=0)
        ax.plot(t_fc, block["mean"].to_numpy(), color="C0", lw=1.4)
        ax.set_title(var)
    fig.tight_layout()
    return fig
