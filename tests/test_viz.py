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


class TestAsyncLiveView:
    """Background-thread rendering with a depth-1 latest-frame channel
    (ref src/BilevelVisualise.jl:71-89,279-295; VERDICT r3 #7)."""

    def test_slow_renderer_does_not_block_iteration(self):
        import time
        drawn = []

        def slow(image, param):
            time.sleep(0.15)
            drawn.append(np.asarray(image)[0, 0])

        view = LiveView(renderer=slow)
        t0 = time.perf_counter()
        for i in range(8):
            view.show(np.full((4, 4), float(i)), None)
        enqueue_time = time.perf_counter() - t0
        # 8 frames × 0.15 s renderer would be 1.2 s synchronous; the
        # enqueues must return immediately
        assert enqueue_time < 0.1
        view.close()
        # latest-frame dropping: far fewer draws than frames, and the
        # FINAL frame is drawn on close (drain semantics)
        assert 1 <= len(drawn) <= 4
        assert drawn[-1] == 7.0
        assert view.frames_dropped >= 4
        assert view.frames_drawn == len(drawn)

    def test_fast_renderer_draws_everything(self):
        import time
        drawn = []
        view = LiveView(renderer=lambda im, p: drawn.append(im[0, 0]))
        for i in range(5):
            view.show(np.full((4, 4), float(i)), None)
            time.sleep(0.02)
        view.close()
        assert drawn[-1] == 4.0 and len(drawn) >= 4

    def test_renderer_exception_does_not_kill_run(self):
        def boom(image, param):
            raise RuntimeError("display fell over")

        view = LiveView(renderer=boom)
        view.show(np.zeros((4, 4)), None)
        view.close()   # joins cleanly; no exception propagates
        assert view.frames_drawn >= 1

    def test_show_after_close_is_noop(self):
        drawn = []
        view = LiveView(renderer=lambda im, p: drawn.append(1))
        view.show(np.zeros((4, 4)), None)
        view.close()
        n = len(drawn)
        # a fresh show() restarts the pump (close resets the stop flag)
        view.show(np.zeros((4, 4)), None)
        view.close()
        assert len(drawn) == n + 1
