import pathlib

from geconpy_tpu import model_from_gcn
from geconpy_tpu.utils.reporting import print_steady_state

DATA = pathlib.Path(__file__).parents[1] / "geconpy_tpu" / "data"


def test_build_report_and_html():
    model = model_from_gcn(str(DATA / "rbc.gcn"))
    report = model.build_report()
    assert "equations" in report and "variables" in report
    assert "fully analytic" in report
    assert "square" in report

    html = model._repr_html_()
    assert "Block: HOUSEHOLD" in html
    assert "\\[" in html  # LaTeX present

    block_html = model.primitives.blocks["HOUSEHOLD"]._repr_html_()
    assert "Objective" in block_html


def test_print_steady_state(capsys):
    model = model_from_gcn(str(DATA / "rbc.gcn"))
    ss = model.steady_state(verbose=False)
    text = print_steady_state(ss)
    assert "converged" in text
    assert "K_ss" in text
