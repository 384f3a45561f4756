"""Outer-loop iteration harness: logging, timing, stopping, visualization.

Equivalent of ``iterate_bilevel_visualise`` / ``initialise_bilevel_visualisation``
(``src/BilevelVisualise.jl:185-304``) with the same observable semantics:

* logging cadence: every iteration while iter ≤ 20, every 10 while ≤ 200,
  then every ``verbose_iter`` (ref ``:200``);
* wall-time accounting per logged iteration that *excludes* time spent in
  logging/visualization (``wasted_time``, ref ``:201-203,243``), and starts
  the clock after iteration 1 to exclude JIT compile time (ref ``:192-196``);
* stop when the trust-region radius Δ falls below ``params.tol`` (ref
  ``:246-248``);
* per-iteration PNG dumps behind ``save_iterations`` (ref ``:238-241``);
* Ctrl-C stops iterating gracefully and returns the current state/log
  (ref ``:257-269``).

The live GR window becomes an optional matplotlib window, headless-safe and
off by default under pytest/CI.
"""

from __future__ import annotations

import sys
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from ..viz.log import BilevelLogEntry, IterLog

__all__ = ["BilevelState", "bilevel_iterate", "LiveView"]


class LiveView:
    """Optional live visualization of the current reconstruction and
    (for patch/3-map parameters) normalized parameter maps
    (ref ``src/BilevelVisualise.jl:100-171,213-235``).  Headless-safe.

    Rendering happens on a background thread fed by a depth-1
    latest-frame channel: :meth:`show` never blocks the iteration — if
    the renderer is still busy when the next frame arrives, the pending
    frame is REPLACED (dropped) so the display always shows the newest
    iterate.  This matches the reference's ``Threads.@spawn`` consumer on
    a bounded ``Channel(1)`` that keeps only the latest frame
    (``src/BilevelVisualise.jl:71-89,279-295``); ``wasted_time``
    accounting in the harness then only covers the cheap enqueue.

    ``renderer(image, param)`` is injectable (tests; alternative
    backends).  The default matplotlib renderer no-ops headless (agg);
    interactive GUI backends that require main-thread drawing should be
    wrapped in a renderer that marshals to their event loop."""

    def __init__(self, renderer: Optional[Callable] = None):
        self._renderer = renderer if renderer is not None else self._draw
        self._cond = threading.Condition()
        self._frame = None          # latest pending frame, depth-1 channel
        self._stopping = False
        self._thread = None
        self._fig = None
        self.frames_drawn = 0
        self.frames_dropped = 0

    def show(self, image: np.ndarray, param: Optional[np.ndarray]):
        """Enqueue the newest frame (non-blocking; replaces any pending
        one) and make sure the render thread is running."""
        frame = (np.asarray(image),
                 None if param is None else np.asarray(param))
        with self._cond:
            if self._stopping:
                return
            if self._thread is None:
                self._thread = threading.Thread(
                    target=self._pump, name="bpldenoising-liveview",
                    daemon=True)
                self._thread.start()
            if self._frame is not None:
                self.frames_dropped += 1
            self._frame = frame
            self._cond.notify()

    def _pump(self):
        while True:
            with self._cond:
                while self._frame is None and not self._stopping:
                    self._cond.wait()
                if self._frame is None:     # stopping, nothing pending
                    return
                frame, self._frame = self._frame, None
            try:
                self._renderer(*frame)
            except Exception:
                pass  # visualization must never take down a run
            self.frames_drawn += 1

    def _draw(self, image: np.ndarray, param: Optional[np.ndarray]):
        import matplotlib
        import matplotlib.pyplot as plt
        if self._fig is None:
            if matplotlib.get_backend().lower() == "agg":
                return  # headless: no-op
            plt.ion()
            self._fig = plt.figure("bpldenoising")
        self._fig.clf()
        ncols = 1 + (param is not None)
        ax = self._fig.add_subplot(1, ncols, 1)
        if image.ndim == 3:  # planar (C, M, N) color → HWC for imshow
            image = np.clip(np.moveaxis(image, 0, -1), 0.0, 1.0)
        ax.imshow(image, cmap="gray")
        ax.set_title("reconstruction")
        ax.axis("off")
        if param is not None:
            ax2 = self._fig.add_subplot(1, ncols, 2)
            ax2.imshow(param, cmap="gray")
            ax2.set_title("parameter")
            ax2.axis("off")
        self._fig.canvas.draw_idle()
        self._fig.canvas.flush_events()

    def close(self):
        """Drain the channel (a pending frame is still drawn — the final
        iterate stays on screen, ref ``finalise_bilevel_visualisation``)
        and join the render thread."""
        with self._cond:
            self._stopping = True
            self._cond.notify()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None
        self._stopping = False
        if self._fig is not None:
            try:
                import matplotlib.pyplot as plt
                plt.close(self._fig)
            except Exception:
                pass
            self._fig = None


@dataclass
class BilevelState:
    """Harness state returned to experiment drivers (plays the role of the
    reference's ``BilevelState``, ``src/BilevelVisualise.jl:48-54``)."""
    log: IterLog = field(default_factory=IterLog)
    start_time: Optional[float] = None
    wasted_time: float = 0.0
    interrupted: bool = False
    view: Optional[LiveView] = None


def _should_log(iteration: int, verbose_iter: int) -> bool:
    # ref src/BilevelVisualise.jl:200 — OR of three conditions, so
    # verbose_iter=1 logs every iteration; verbose_iter <= 0 disables
    # logging entirely (extension; the reference cannot disable it)
    if verbose_iter <= 0:
        return False
    return (iteration <= 20
            or (iteration <= 200 and iteration % 10 == 0)
            or iteration % verbose_iter == 0)


def bilevel_iterate(step: Callable, params, visualise: bool = False,
                    save_iteration_fn: Optional[Callable] = None,
                    state: Optional[BilevelState] = None,
                    start_iteration: int = 0) -> BilevelState:
    """Run ``step(verbose)`` for up to ``params.maxiter`` iterations.

    ``step`` receives a ``verbose() -> (x, image, fx, gnorm, delta, step_norm)``
    callback contract mirroring TRBox's 6-tuple (ref ``src/TRBox.jl:264-266``):
    the step function calls ``verbose(lambda: ...)`` once per iteration; the
    harness decides whether to actually materialize/log it.

    ``start_iteration``: resume offset — iteration numbering continues from
    ``start_iteration + 1`` and the total budget stays ``maxiter`` (a
    resumed run performs only the remaining iterations).

    Returns the harness state; iteration stops at ``maxiter``, when
    Δ < ``params.tol``, or on KeyboardInterrupt.
    """
    st = state if state is not None else BilevelState()
    if visualise:
        st.view = LiveView()
    maxiter = int(params.maxiter)
    verbose_iter = int(params.get("verbose_iter", 1) or 0)
    tol = float(params.get("tol", 0.0))

    try:
        first_iter = int(start_iteration) + 1
        for iteration in range(first_iter, maxiter + 1):
            # exclude the FIRST iteration of THIS process from the clock
            # (JIT compile time) — on resume that is start_iteration+1,
            # not iteration 1
            if st.start_time is None and iteration > first_iter:
                # exclude first-iteration JIT compile (ref :192-196); waste
                # accrued before the clock started must not be subtracted
                # from post-clock elapsed time
                st.start_time = time.perf_counter()
                st.wasted_time = 0.0

            stop = False

            def verbose(value_fn, _it=iteration):
                nonlocal stop
                nonlocal_st = st
                if not _should_log(_it, verbose_iter):
                    return
                t0 = time.perf_counter()
                vals = value_fn()
                x, image, fx, gnorm, delta, step_norm = vals[:6]
                # optional 7th element: adjoint-CG telemetry dict
                # ({iters, resnorm, converged}, utils/telemetry.py)
                cg = vals[6] if len(vals) > 6 else None
                elapsed = (0.0 if nonlocal_st.start_time is None
                           else t0 - nonlocal_st.start_time
                           - nonlocal_st.wasted_time)
                entry = BilevelLogEntry(
                    _it, elapsed, float(fx), float(gnorm), float(delta),
                    float(step_norm))
                if cg is not None:
                    entry.adjoint_cg_iters = float(cg["iters"])
                    entry.adjoint_cg_converged = float(cg["converged"])
                nonlocal_st.log.append(entry)
                print(f"{_it:4d}/{maxiter} f={float(fx):.6e} "
                      f"|g|={float(gnorm):.4e} Δ={float(delta):.4e} "
                      f"step={float(step_norm):.4e}",
                      file=sys.stderr, flush=True)
                if nonlocal_st.view is not None:
                    xa = np.asarray(x)
                    pmap = None
                    if xa.ndim >= 2:  # patch / 3-map parameter display
                        lo, hi = xa.min(), xa.max()
                        pmap = (xa - lo) / (hi - lo) if hi > lo else xa * 0
                        pmap = pmap.reshape(pmap.shape[0], -1)
                    nonlocal_st.view.show(np.asarray(image), pmap)
                if save_iteration_fn is not None:
                    save_iteration_fn(_it, np.asarray(image))
                if float(delta) < tol:  # ref :246-248
                    stop = True
                nonlocal_st.wasted_time += time.perf_counter() - t0

            # `step` may itself request a stop (Δ < tol) — decoupled from
            # logging, unlike the reference where the stop check lives only
            # inside the visualiser callback.
            requested = step(verbose)
            if stop or requested:
                break
    except KeyboardInterrupt:  # ref :257-269
        st.interrupted = True
        print("interrupted — returning current state", file=sys.stderr,
              flush=True)

    if st.view is not None:
        st.view.close()
    return st
