"""Segmented EM: run a long fit as several bounded program executions.

Why this exists: one `fit` call is a single compiled `lax.while_loop`
program whose wall time grows with max_iter x data size. Remote TPU
runtimes commonly bound single-execution wall time, and a monolithic fit
cannot survive preemption. The reference has no analog (its sklearn-style
EM is a host-side Python loop, `gmm_cplx_bussgang.py:437-546`, so it is
interruptible for free); on TPU the idiomatic replacement is to keep the
in-segment loop compiled and cut the fit at segment boundaries, where the
inter-segment state is the model's own checkpointable parameter pytree.
`gmm.fit_resume` / `mfa.fit_resume` / `gmm_quant.fit_resume` make the
restart exact — including structured (toeplitz/block-toeplitz) fits,
whose inv-em spectrum is recovered from the checkpointed covariances by
`linalg.spectrum_from_covariance`.

Works for every EM family through two callables, so it composes with
sharded fits (`parallel.mesh.fit_*_shard_map`) unchanged:

    cfg_seg = cfg._replace(max_iter=25)          # per-segment budget
    res = fit_segmented(
        lambda: gmm.fit(key, h, cfg_seg),
        lambda prev: gmm.fit_resume(prev.params, h, cfg_seg),
        n_segments=8)

    # quantized-training EM (resume takes the full previous result):
    res = fit_segmented(
        lambda: gmm_quant.fit(key, r, cfg_seg, n_bits, sigma2, q=q),
        lambda prev: gmm_quant.fit_resume(key2, prev, r, cfg_seg,
                                          n_bits, sigma2, q=q),
        n_segments=8)
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["fit_segmented"]


def fit_segmented(start_fn: Callable[[], Any],
                  resume_fn: Callable[[Any], Any],
                  n_segments: int,
                  checkpointer: Optional[Any] = None,
                  example_result: Optional[Any] = None,
                  max_retries: int = 0):
    """Run EM as up to `n_segments` bounded executions; stop on convergence.

    start_fn() runs the first segment; resume_fn(prev_result) each later
    one. Results must be a fit-result NamedTuple with `converged` and
    `n_iter` fields (GmmFitResult / MfaFitResult / QuantGmmFitResult all
    qualify); bake the per-segment iteration budget into the closed-over
    cfg (cfg.max_iter = segment length). The convergence flag is read back
    on the host at each boundary — the natural sync point between
    executions.

    With a `checkpointer` (utils.checkpoint.TrainCheckpointer), every
    segment's full result pytree is saved at step = segment index, and a
    rerun against the same directory resumes AFTER the latest saved
    segment instead of refitting (crash recovery across processes). A
    restore needs `example_result` — a result pytree of matching
    structure/shapes/dtypes (e.g. a 1-iteration fit on a small slice, or
    ShapeDtypeStructs) — and raises if one is needed but not given, rather
    than silently refitting from scratch.

    `max_retries` > 0 re-runs a segment that died with a
    `jax.errors.JaxRuntimeError` (remote TPU runtimes drop compiles and
    executions transiently — observed: "remote_compile: read body:
    response body closed" killing a D=1024 resume compile). Segments are
    pure functions of the previous result, so a retry is exact; programming
    errors (TypeError/ValueError/...) are never retried.

    Returns the final result with `n_iter` replaced by the TOTAL iteration
    count across all segments run in this process and any restored ones
    (per-segment n_iter is an implementation detail of the segmentation).
    """
    seg0 = 0
    result = None
    total_iter = 0
    if checkpointer is not None:
        last = checkpointer.latest_step()
        if last is not None:
            if example_result is None:
                raise ValueError(
                    "checkpointer has saved segments but no example_result "
                    "was given to restore them; refusing to refit from "
                    "scratch")
            result = checkpointer.restore(last, example_result)
            seg0 = last + 1
            total_iter = int(result.n_iter)
            if bool(result.converged):
                # the checkpointed run already converged; re-training the
                # remaining segments would burn iterations on a done model
                return result

    for seg in range(seg0, n_segments):
        for attempt in range(max_retries + 1):
            try:
                step = start_fn() if result is None else resume_fn(result)
                # force a scalar readback INSIDE the guard: under async
                # dispatch a dropped execution raises at first readback,
                # not at dispatch (remote runtimes surface failures only
                # here) — without this the error would escape the retry
                step_iters = int(step.n_iter)
                break
            except jax.errors.JaxRuntimeError:
                if attempt == max_retries:
                    raise
        result = step
        total_iter += step_iters
        result = result._replace(n_iter=_as_scalar(result, total_iter))
        if checkpointer is not None:
            checkpointer.save(seg, result)
        if bool(result.converged):
            break
    if result is None:
        raise ValueError("n_segments must be >= 1")
    return result


def _as_scalar(result, value: int):
    """An n_iter leaf of the same dtype as the result's own."""
    return jnp.asarray(value, getattr(result.n_iter, "dtype", jnp.int32))
