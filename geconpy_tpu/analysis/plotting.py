"""Matplotlib plotting layer.

Role parity with ``gEconpy/plotting.py`` (plot_simulation:202, plot_irf:393,
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
]


def _plt():
    import matplotlib.pyplot as plt

    return plt


def prepare_gridspec_figure(n_plots: int, n_cols: int = 3, figsize=None):
    """Figure + axes grid sized for ``n_plots`` panels."""
    plt = _plt()
    n_rows = -(-n_plots // n_cols)
    if figsize is None:
        figsize = (4 * n_cols, 2.6 * n_rows)
    fig, axes = plt.subplots(n_rows, n_cols, figsize=figsize, squeeze=False)
    flat = axes.ravel()
    for ax in flat[n_plots:]:
        ax.set_visible(False)
    return fig, flat[:n_plots]


def plot_simulation(simulation_df, variables=None, n_cols: int = 3,
                    alpha: float = 0.3, ci: float = 0.9):
    """Fan chart of simulated paths: per-variable quantile band + mean."""
    variables = variables or list(simulation_df.columns)
    fig, axes = prepare_gridspec_figure(len(variables), n_cols)
    grouped = simulation_df.groupby(level="time")
    lo_q, hi_q = (1 - ci) / 2, 1 - (1 - ci) / 2
    for ax, var in zip(axes, variables):
        mean = grouped[var].mean()
        lo = grouped[var].quantile(lo_q)
        hi = grouped[var].quantile(hi_q)
        ax.fill_between(mean.index, lo, hi, alpha=alpha)
        ax.plot(mean.index, mean.values, lw=1.5)
        ax.set_title(var)
        ax.axhline(0.0, color="k", lw=0.5, ls=":")
    fig.tight_layout()
    return fig


def plot_irf(irf_df, variables=None, shocks=None, n_cols: int = 3,
             legend: bool = True):
    """IRF panels per variable, one line per shock."""
    variables = variables or list(irf_df.columns)
    shocks = shocks or list(irf_df.index.get_level_values("shock").unique())
    fig, axes = prepare_gridspec_figure(len(variables), n_cols)
    for ax, var in zip(axes, variables):
        for shock in shocks:
            series = irf_df.loc[shock][var]
            ax.plot(series.index, series.values, label=shock)
        ax.set_title(var)
        ax.axhline(0.0, color="k", lw=0.5, ls=":")
    if legend and len(shocks) > 1:
        axes[0].legend(fontsize=8)
    fig.tight_layout()
    return fig


def plot_eigenvalues(bk_table, ax=None):
    """Unit-circle eigenvalue plot from Model.check_bk_condition output."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots(figsize=(5, 5))
    theta = np.linspace(0, 2 * np.pi, 200)
    ax.plot(np.cos(theta), np.sin(theta), "k--", lw=0.7)
    finite = np.isfinite(bk_table["modulus"])
    ax.scatter(bk_table["real"][finite], bk_table["imag"][finite], s=25)
    n_inf = int((~finite).sum())
    title = "Generalized eigenvalues"
    if n_inf:
        title += f" ({n_inf} infinite not shown)"
    ax.set_title(title)
    ax.set_xlabel("Re")
    ax.set_ylabel("Im")
    ax.set_aspect("equal")
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


def plot_acf(acf_df, variables=None, n_cols: int = 3):
    """Autocorrelation-function stem plots (per variable, vs itself)."""
    variables = variables or list(acf_df.columns)
    fig, axes = prepare_gridspec_figure(len(variables), n_cols)
    lags = acf_df.index.get_level_values("lag").unique()
    for ax, var in zip(axes, variables):
        values = [acf_df.loc[(lag, var), var] for lag in lags]
        ax.bar(lags, values, width=0.3)
        ax.set_title(var)
        ax.set_ylim(-1.05, 1.05)
    fig.tight_layout()
    return fig


def plot_corner(samples, names=None, figsize=None):
    """Corner (pairs) plot of posterior draws (chains, draws, dim)."""
    plt = _plt()
    arr = np.asarray(samples)
    if arr.ndim == 3:
        arr = arr.reshape(-1, arr.shape[-1])
    d = arr.shape[1]
    names = names or [f"x{i}" for i in range(d)]
    fig, axes = plt.subplots(d, d, figsize=figsize or (2 * d, 2 * d),
                             squeeze=False)
    for i in range(d):
        for j in range(d):
            ax = axes[i][j]
            if j > i:
                ax.set_visible(False)
            elif i == j:
                ax.hist(arr[:, i], bins=40, density=True)
            else:
                ax.hist2d(arr[:, j], arr[:, i], bins=40)
            if i == d - 1:
                ax.set_xlabel(names[j], fontsize=8)
            if j == 0:
                ax.set_ylabel(names[i], fontsize=8)
    fig.tight_layout()
    return fig


def plot_kalman_filter(filter_result, data=None, state_names=None,
                       kind: str = "filtered", n_cols: int = 3):
    """Filtered/predicted/smoothed state paths with 1-sigma bands."""
    mean = np.asarray(getattr(filter_result, f"{kind}_mean"))
    cov = np.asarray(getattr(filter_result, f"{kind}_cov"))
    n = mean.shape[1]
    state_names = list(state_names) if state_names is not None else [f"state {i}" for i in range(n)]
    fig, axes = prepare_gridspec_figure(n, n_cols)
    t = np.arange(mean.shape[0])
    for i, ax in enumerate(axes):
        sd = np.sqrt(np.maximum(cov[:, i, i], 0))
        ax.fill_between(t, mean[:, i] - sd, mean[:, i] + sd, alpha=0.3)
        ax.plot(t, mean[:, i], lw=1.2)
        ax.set_title(state_names[i])
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
                              n_points: int = 300):
    """Posterior histograms overlaid with prior densities."""
    import jax.numpy as jnp

    names = result.param_names
    fig, axes = prepare_gridspec_figure(len(names), n_cols)
    flat = result.samples.reshape(-1, len(names))
    for i, (ax, name) in enumerate(zip(axes, names)):
        ax.hist(flat[:, i], bins=40, density=True, alpha=0.6,
                label="posterior")
        if name in priors:
            lo, hi = priors[name].hdi(0.995)
            xs = np.linspace(lo, hi, n_points)
            ys = np.exp(np.asarray(priors[name].logpdf(jnp.asarray(xs))))
            ax.plot(xs, ys, "k-", lw=1.2, label="prior")
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
