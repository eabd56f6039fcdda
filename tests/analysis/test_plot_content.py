"""Figure-CONTENT assertions for the plotting layer.

The smoke tests in test_dynare_and_plotting.py check figures build; these
check the figures are RIGHT: plotted line/bar/scatter data equal the input
numbers, titles/labels/legends name the right things, bands and annotations
appear where the math says they should (mirrors the reference's
tests/test_plotting.py content checks).
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from geconpy_tpu.analysis import plotting


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


def _line_by_length(ax, n):
    return [ln for ln in ax.lines if len(ln.get_ydata()) == n]


class TestPlotSimulationContent:
    def _sim_df(self):
        rng = np.random.default_rng(0)
        idx = pd.MultiIndex.from_product([range(5), range(12)],
                                         names=["simulation", "time"])
        return pd.DataFrame(rng.normal(size=(60, 2)), index=idx,
                            columns=["Y", "C"])

    def test_mean_line_and_band_match_quantiles(self):
        df = self._sim_df()
        fig = plotting.plot_simulation(df, ci=0.8)
        ax = fig.axes[0]
        assert ax.get_title() == "Y"
        mean = df.groupby(level="time")["Y"].mean().to_numpy()
        line = _line_by_length(ax, 12)[-1]          # mean drawn after band
        np.testing.assert_allclose(line.get_ydata(), mean)
        # the fill_between band spans the requested quantiles
        band = ax.collections[0].get_paths()[0].vertices[:, 1]
        lo = df.groupby(level="time")["Y"].quantile(0.1).to_numpy()
        hi = df.groupby(level="time")["Y"].quantile(0.9).to_numpy()
        assert band.min() == pytest.approx(lo.min())
        assert band.max() == pytest.approx(hi.max())

    def test_spaghetti_paths_are_actual_paths(self):
        df = self._sim_df()
        fig = plotting.plot_simulation(df, variables=["Y"], n_paths=3)
        ax = fig.axes[0]
        paths = _line_by_length(ax, 12)
        # 3 spaghetti + 1 mean
        assert len(paths) == 4
        np.testing.assert_allclose(
            paths[0].get_ydata(), df.xs(0, level="simulation")["Y"])


class TestPlotIRFContent:
    def _irf_df(self):
        idx = pd.MultiIndex.from_product(
            [["eps_a", "eps_b"], range(8)], names=["shock", "time"])
        vals = np.arange(16, dtype=float)
        return pd.DataFrame({"Y": vals, "C": -vals}, index=idx)

    def test_lines_equal_irf_values(self):
        df = self._irf_df()
        fig = plotting.plot_irf(df, variables=["Y"], legend=True)
        ax = fig.axes[0]
        assert ax.get_title() == "Y"
        lines = _line_by_length(ax, 8)
        assert len(lines) == 2                      # one per shock
        np.testing.assert_allclose(lines[0].get_ydata(),
                                   df.xs("eps_a", level="shock")["Y"])
        np.testing.assert_allclose(lines[1].get_ydata(),
                                   df.xs("eps_b", level="shock")["Y"])
        labels = [t.get_text() for t in ax.get_legend().get_texts()]
        assert labels == ["eps_a", "eps_b"]

    def test_cumulative_cumsums(self):
        df = self._irf_df()
        fig = plotting.plot_irf(df, variables=["Y"], shocks=["eps_a"],
                                cumulative=True, legend=False)
        line = _line_by_length(fig.axes[0], 8)[0]
        np.testing.assert_allclose(
            line.get_ydata(),
            np.cumsum(df.xs("eps_a", level="shock")["Y"].to_numpy()))

    def test_group_by_shock_panels(self):
        df = self._irf_df()
        fig = plotting.plot_irf(df, group_by="shock")
        titles = {ax.get_title() for ax in fig.axes if ax.get_title()}
        assert titles == {"eps_a", "eps_b"}


class TestPlotEigenvaluesContent:
    def _table(self):
        return pd.DataFrame({
            "real": [0.5, -0.3, 1.2, np.inf],
            "imag": [0.1, 0.0, 0.0, 0.0],
            "modulus": [np.hypot(0.5, 0.1), 0.3, 1.2, np.inf],
        })

    def test_scatter_partition_and_title(self):
        ax = plotting.plot_eigenvalues(self._table())
        stable = ax.collections[-2].get_offsets()
        unstable = ax.collections[-1].get_offsets()
        np.testing.assert_allclose(np.asarray(stable),
                                   [[0.5, 0.1], [-0.3, 0.0]])
        np.testing.assert_allclose(np.asarray(unstable), [[1.2, 0.0]])
        assert "1 infinite" in ax.get_title()

    def test_near_unit_roots_annotated(self):
        table = pd.DataFrame({"real": [0.99, 0.2], "imag": [0.0, 0.0],
                              "modulus": [0.99, 0.2]})
        ax = plotting.plot_eigenvalues(table, annotate_near=0.05)
        texts = [t.get_text() for t in ax.texts]
        assert "0.990" in texts
        assert len(texts) == 1                      # 0.2 not annotated


class TestPlotHeatmapContent:
    def test_image_values_ticks_annotations(self):
        df = pd.DataFrame([[1.0, -0.5], [0.25, 0.0]],
                          index=["K", "A"], columns=["K", "A"])
        ax = plotting.plot_heatmap(df)
        np.testing.assert_allclose(
            np.asarray(ax.images[0].get_array()), df.to_numpy())
        assert [t.get_text() for t in ax.get_xticklabels()] == ["K", "A"]
        texts = {t.get_text() for t in ax.texts}
        assert {"1.00", "-0.50", "0.25", "0.00"} <= texts
        # symmetric color scale centered at zero
        assert ax.images[0].norm.vmin == -ax.images[0].norm.vmax


class TestPlotACFContent:
    def _acf_df(self):
        lags = range(4)
        cols = ["Y", "C"]
        idx = pd.MultiIndex.from_product([lags, cols],
                                         names=["lag", "variable"])
        df = pd.DataFrame(0.0, index=idx, columns=cols)
        for k in lags:
            df.loc[(k, "Y"), "Y"] = 0.9 ** k
            df.loc[(k, "C"), "C"] = 0.5 ** k
        return df

    def test_bar_heights_equal_acf(self):
        fig = plotting.plot_acf(self._acf_df(), variables=["Y"])
        ax = fig.axes[0]
        heights = [p.get_height() for p in ax.patches]
        np.testing.assert_allclose(heights, [0.9 ** k for k in range(4)])
        assert ax.get_ylim() == (-1.05, 1.05)

    def test_white_noise_band(self):
        fig = plotting.plot_acf(self._acf_df(), variables=["Y"], n_obs=100)
        ax = fig.axes[0]
        band = 1.96 / 10.0
        # axhspan adds a Rectangle spanning exactly [-band, band] in data y
        for p in ax.patches:
            if np.isclose(p.get_y(), -band) \
                    and np.isclose(p.get_height(), 2 * band):
                break
        else:
            raise AssertionError("significance band missing")


class TestPlotPriorsContent:
    def test_density_curve_is_the_pdf(self):
        from geconpy_tpu.dists import Beta

        prior = Beta(alpha=2.0, beta=5.0)
        fig = plotting.plot_priors({"rho": prior})
        ax = fig.axes[0]
        assert ax.get_title() == "rho"
        x = ax.lines[0].get_xdata()
        y = ax.lines[0].get_ydata()
        # integrates to ~1 over the plotted range and peaks at the mode
        assert np.trapezoid(y, x) == pytest.approx(1.0, abs=0.02)
        mode = (2.0 - 1) / (2.0 + 5.0 - 2)
        assert x[np.argmax(y)] == pytest.approx(mode, abs=0.02)


class TestPlotSolvabilitySummaryContent:
    def test_bar_counts_match_value_counts(self):
        df = pd.DataFrame({"failure_stage":
                           ["none"] * 5 + ["steady_state"] * 3 + ["policy_solve"] * 2})
        ax = plotting.plot_solvability_summary(df)
        labels = [t.get_text() for t in ax.get_xticklabels()]
        heights = [p.get_height() for p in ax.patches]
        assert dict(zip(labels, heights)) == {
            "none": 5, "steady_state": 3, "policy_solve": 2}


class TestPlotShockDecompositionContent:
    def test_bars_stack_to_totals(self):
        rng = np.random.default_rng(3)
        T = 10
        idx = pd.MultiIndex.from_product([range(T), ["Y"]],
                                         names=["time", "variable"])
        df = pd.DataFrame({
            "eps_a": rng.normal(size=T),
            "eps_b": rng.normal(size=T),
            "initial": rng.normal(size=T) * 0.1,
        }, index=idx)
        df["smoothed"] = df[["eps_a", "eps_b", "initial"]].sum(axis=1)
        fig = plotting.plot_shock_decomposition(df)
        ax = fig.axes[0]
        # sum of all bar heights per period == smoothed total
        per_period = np.zeros(T)
        for p in ax.patches:
            t = int(round(p.get_x() + p.get_width() / 2))
            per_period[t] += p.get_height()
        block = df.xs("Y", level="variable")
        np.testing.assert_allclose(per_period, block["smoothed"], atol=1e-12)
        # the overlay line is the smoothed series
        line = _line_by_length(ax, T)[-1]
        np.testing.assert_allclose(line.get_ydata(), block["smoothed"])


class TestPlotTimeseriesContent:
    def test_line_data_and_titles(self):
        df = pd.DataFrame({"Y": np.arange(6.0), "pi": np.arange(6.0) ** 2})
        fig = plotting.plot_timeseries(df)
        by_title = {ax.get_title(): ax for ax in fig.axes if ax.get_title()}
        assert set(by_title) == {"Y", "pi"}
        np.testing.assert_allclose(by_title["Y"].lines[0].get_ydata(),
                                   df["Y"])
        np.testing.assert_allclose(by_title["pi"].lines[0].get_ydata(),
                                   df["pi"])


class TestGridspecHelper:
    def test_surplus_panels_hidden_and_count(self):
        fig, axes = plotting.prepare_gridspec_figure(7, n_cols=3)
        assert len(axes) == 7
        all_axes = fig.get_axes()
        assert len(all_axes) == 9
        hidden = [a for a in all_axes if not a.get_visible()]
        assert len(hidden) == 2

    def test_sharex_relabels_panel_above_hidden(self):
        fig, axes = plotting.prepare_gridspec_figure(4, n_cols=3, sharex=True)
        # panel 1 sits above the hidden slot 4 (row-major): its x tick
        # labels must be re-enabled so the column keeps a labeled axis
        lab = [t.get_visible() for t in axes[1].get_xticklabels()]
        assert all(lab)

    def test_suptitle_set(self):
        fig, _ = plotting.prepare_gridspec_figure(2, suptitle="hello")
        assert fig._suptitle.get_text() == "hello"


class TestPlotEstimatedMatrixContent:
    def test_histograms_match_entries_and_titles(self):
        rng = np.random.default_rng(3)
        draws = rng.normal(loc=[[0.0, 5.0], [-5.0, 10.0]],
                           scale=0.1, size=(400, 2, 2))
        fig = plotting.plot_estimated_matrix(draws, index=["r1", "r2"],
                                             columns=["c1", "c2"])
        axes = [a for a in fig.get_axes() if a.get_visible()]
        assert len(axes) == 4
        # each panel's histogram mass centers on the right entry mean
        for idx, ax in enumerate(axes):
            i, j = divmod(idx, 2)
            centers = np.array([(p.get_x() + p.get_width() / 2)
                                for p in ax.patches])
            weights = np.array([p.get_height() for p in ax.patches])
            mean = (centers * weights).sum() / weights.sum()
            np.testing.assert_allclose(mean, draws[:, i, j].mean(), atol=0.05)
        assert axes[1].get_title() == "[r1, c2]"


class TestPlotEigenvalueSensitivityContent:
    def test_spectral_radius_frame_bars(self):
        df = pd.DataFrame({"d_rho_d_param": [0.3, -0.2, 0.05]},
                          index=["alpha", "beta", "delta"])
        ax = plotting.plot_eigenvalue_sensitivity(df)
        heights = [p.get_height() for p in ax.patches]
        np.testing.assert_allclose(heights, [0.3, -0.2, 0.05])
        assert "rho" in ax.get_ylabel() or r"\rho" in ax.get_ylabel()

    def test_real_model_sensitivity_table_renders(self):
        import geconpy_tpu
        from geconpy_tpu.stats.perturbation_diagnostics import (
            eigenvalue_sensitivity)

        m = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("rbc"),
                                       verbose=False)
        table = eigenvalue_sensitivity(m)
        ax = plotting.plot_eigenvalue_sensitivity(table, n_eigs=3)
        assert ax.patches, "no sensitivity bars drawn"
        assert ax.get_legend() is not None


class TestPlotPerfectForesightContent:
    def test_lines_match_trajectory_and_terminal_marker(self):
        import collections

        traj = pd.DataFrame(
            {"K": np.linspace(1.0, 2.0, 30),
             "C": np.linspace(0.5, 0.8, 30)})
        Result = collections.namedtuple("Result", "trajectory")
        fig = plotting.plot_perfect_foresight(Result(traj))
        axes = [a for a in fig.get_axes() if a.get_visible()]
        assert [a.get_title() for a in axes] == ["K", "C"]
        for ax, col in zip(axes, ["K", "C"]):
            main = [ln for ln in ax.lines if len(ln.get_ydata()) == 30][0]
            np.testing.assert_allclose(main.get_ydata(), traj[col].to_numpy())
            # dotted terminal-steady-state guide at the last value
            guides = [ln for ln in ax.lines
                      if len(set(np.atleast_1d(ln.get_ydata()))) == 1]
            assert any(np.isclose(g.get_ydata()[0], traj[col].iloc[-1])
                       for g in guides)
