"""Direct tests for the viz layer (plots, live view, log writer)."""

import os

import numpy as np

from bpldenoising_tpu.bilevel.harness import LiveView
from bpldenoising_tpu.viz import (
    BilevelLogEntry,
    IterLog,
    plot_cost_contour,
    plot_cost_curve,
    write_log,
)


def test_plot_cost_curve(tmp_path):
    base = str(tmp_path / "curve")
    plot_cost_curve(np.logspace(-3, 0, 10), np.linspace(5, 1, 10), base)
    assert os.path.exists(base + ".png")
    assert os.path.getsize(base + ".png") > 1000


def test_plot_cost_contour(tmp_path):
    base = str(tmp_path / "contour")
    r = np.logspace(-3, -1, 5)
    costs = np.add.outer(np.arange(5.0), np.arange(5.0))
    plot_cost_contour(r, r, costs, base)
    assert os.path.exists(base + ".png")


def test_write_log_roundtrip(tmp_path):
    log = IterLog()
    log.append(BilevelLogEntry(1, 0.5, 10.0, 2.0, 0.1, 0.01))
    log.append(BilevelLogEntry(2, 1.0, 9.0, 1.5, 0.05, 0.02))
    path = str(tmp_path / "perf.txt")
    write_log(path, log, header="# test header")
    lines = open(path).read().splitlines()
    assert lines[0] == "# test header"
    assert lines[1].startswith("# iter")
    assert len(lines) == 4
    fields = lines[2].split("\t")
    assert int(fields[0]) == 1
    assert float(fields[2]) == 10.0


def test_liveview_headless_is_safe():
    view = LiveView()
    # Agg backend → no-op, must not raise
    view.show(np.zeros((8, 8)), None)
    view.show(np.zeros((8, 8)), np.ones((2, 2)))
    view.close()
