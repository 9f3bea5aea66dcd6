"""Continuous batching service for channel-estimation requests.

Production-serving layer (no counterpart in the reference, which is a batch
research codebase — SURVEY §2.4 names this as new design): requests of
varying sizes are coalesced into fixed-shape microbatches (powers of two up
to `max_batch`) so XLA reuses a small set of compiled programs, and are
flushed either when a batch fills or when the oldest request exceeds
`max_delay_ms`.

The estimator bank is prepared per SNR once and cached (pure pytrees — cheap
to hold many). The compute path is the fused Pallas kernel when available,
falling back to the einsum estimator.
"""
from __future__ import annotations

import threading
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from quantized_channel_estimation_tpu.models import gmm_estimator
from quantized_channel_estimation_tpu.models.gmm import GmmParams
from quantized_channel_estimation_tpu.models.gmm_estimator import PreparedBank
from quantized_channel_estimation_tpu.ops import quantizer as Q
from quantized_channel_estimation_tpu.ops.boundary import asnumpy, cjit


class ServiceOverloadedError(RuntimeError):
    """Raised by submit() when the pending-sample queue exceeds its
    high-water mark — explicit load shedding instead of unbounded memory
    growth and blind latency."""


@dataclass
class _Request:
    r: np.ndarray                 # (n, M) complex observations
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[BaseException] = None


class EstimationService:
    """Microbatching front-end over a prepared GMM bank.

    submit() is thread-safe and blocks until the estimate is ready; a
    background thread coalesces outstanding requests per SNR into padded
    fixed-shape batches.
    """

    def __init__(self, params: GmmParams, a, n_bits, quantizer_type="uniform",
                 max_batch: int = 4096, max_delay_ms: float = 5.0,
                 use_pallas: Optional[bool] = None, mode="all",
                 max_banks: int = 64, snr_step_db: Optional[float] = 0.1,
                 max_queue: int = 262_144):
        """max_banks: LRU cap on cached per-SNR PreparedBanks (each is
        K*M^2 complex + K*D*M plus a per-shape compiled-program set — a
        client sweeping arbitrary float SNRs must not grow memory without
        bound). snr_step_db: submitted SNRs snap to this grid before bank
        lookup, so nearby floats (10.0 vs 10.0001) share one bank; a
        sub-0.1 dB bank mismatch is far below model error. None disables.
        max_queue: high-water mark on total pending SAMPLES across SNRs;
        submit() raises ServiceOverloadedError beyond it (explicit
        backpressure instead of unbounded queue growth)."""
        if use_pallas is None:
            # auto: the fused kernel serves 'all'-mode requests on TPU;
            # selection modes and kernel-less backends take the einsum path
            import jax
            use_pallas = (mode == "all"
                          and jax.default_backend() == "tpu")
        self.params = params
        self.a = a
        self.n_bits = n_bits
        self.quantizer_type = quantizer_type
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1000.0
        self.mode = mode
        self.use_pallas = use_pallas
        self.max_banks = max_banks
        self.snr_step = snr_step_db
        self.max_queue = max_queue
        self._banks: "OrderedDict[float, PreparedBank]" = OrderedDict()
        self._queues: "OrderedDict[float, List[Tuple[float, _Request]]]" = (
            OrderedDict())
        self._pending = 0  # total queued samples, guarded by _lock
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._prepare = cjit(gmm_estimator.prepare_bank, static_argnums=(3,))
        if use_pallas and mode != "all":
            # the fused kernel only computes the dense 'all'-mode combine;
            # silently serving 'all' results for a selection mode would be
            # wrong answers, not slow ones
            raise ValueError("use_pallas=True requires mode='all' "
                             f"(got mode={mode!r})")
        if use_pallas:
            import jax
            from quantized_channel_estimation_tpu.estimators import (
                pallas_kernels as pk)
            interp = jax.default_backend() != "tpu"
            self._estimate = cjit(
                lambda b, r: pk.estimate_fused(b, r, interpret=interp),
                static_argnums=())
        else:
            self._estimate = cjit(gmm_estimator.estimate,
                                  static_argnums=(2, 3))
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _snap(self, snr: float) -> float:
        if self.snr_step is None:
            return float(snr)
        return round(float(snr) / self.snr_step) * self.snr_step

    def _bank(self, snr: float) -> PreparedBank:
        """LRU-cached prepared bank for a (snapped) SNR. Only the serving
        thread touches the cache, so no lock; the cap bounds memory against
        clients sweeping many distinct SNRs."""
        if snr in self._banks:
            self._banks.move_to_end(snr)
            return self._banks[snr]
        q = Q.design_quantizer(snr, self.n_bits, self.quantizer_type)
        bank = self._prepare(self.params, snr, self.a, self.n_bits, q)
        self._banks[snr] = bank
        while len(self._banks) > self.max_banks:
            self._banks.popitem(last=False)
        return bank

    def submit(self, r: np.ndarray, snr: float,
               timeout: Optional[float] = 30.0) -> np.ndarray:
        """Estimate channels for observations r (n, M) at the given SNR.

        Shape-validates up front so one malformed request fails alone
        instead of poisoning every co-batched request at its SNR."""
        r = np.asarray(r)
        m = self.a.re.shape[0] if hasattr(self.a, "re") else self.a.shape[0]
        if r.ndim != 2 or r.shape[1] != m:
            raise ValueError(f"observations must have shape (n, {m}); "
                             f"got {r.shape} (a 1-D vector would be "
                             "misread as per-row requests)")
        snr = self._snap(snr)
        req = _Request(r)
        with self._lock:
            if self._pending + r.shape[0] > self.max_queue:
                raise ServiceOverloadedError(
                    f"pending queue at {self._pending} samples; request of "
                    f"{r.shape[0]} exceeds the max_queue={self.max_queue} "
                    "high-water mark — retry with backoff or shrink the "
                    "request")
            self._pending += r.shape[0]
            self._queues.setdefault(snr, []).append((time.monotonic(), req))
        if not req.event.wait(timeout):
            raise TimeoutError("estimation request timed out")
        if req.error is not None:
            raise RuntimeError("estimation request failed") from req.error
        return req.result

    def _flush(self, snr: float, batch: List[Tuple[float, _Request]]):
        reqs = [b[1] for b in batch]
        try:
            rs = np.concatenate([q.r for q in reqs], axis=0)
            n = rs.shape[0]
            bank = self._bank(snr)
            # process in power-of-two microbatches capped at max_batch: pad
            # sizes are drawn from the bounded set {16, 32, ..., cap}, so the
            # compiled-program count is bounded AND a single oversized request
            # (or a coalesced queue larger than max_batch) cannot force an
            # arbitrarily large one-off XLA program
            # largest power of two NOT exceeding max_batch (min 16), so the
            # configured bound really caps the compiled program size
            cap = 1 << max(4, self.max_batch.bit_length() - 1)
            outs = []
            for off in range(0, n, cap):
                chunk = rs[off:off + cap]
                m = chunk.shape[0]
                n_pad = 1 << max(4, (m - 1).bit_length())
                rp = np.zeros((n_pad, rs.shape[1]), rs.dtype)
                rp[:m] = chunk
                if self.use_pallas:
                    out = self._estimate(bank, rp)
                else:
                    out = self._estimate(bank, rp, self.mode,
                                         min(n_pad, 2048))
                outs.append(asnumpy(out)[:m])
            out_np = np.concatenate(outs, axis=0)
        except BaseException as e:  # propagate to the waiting clients
            for q in reqs:
                q.error = e
                q.event.set()
            return
        off = 0
        for q in reqs:
            m = q.r.shape[0]
            q.result = out_np[off:off + m]
            off += m
            q.event.set()

    def _loop(self):
        while not self._stop.is_set():
            flushed = False
            with self._lock:
                work = []
                now = time.monotonic()
                for snr, queue in self._queues.items():
                    if not queue:
                        continue
                    total = sum(q.r.shape[0] for _, q in queue)
                    oldest = queue[0][0]
                    if total >= self.max_batch or now - oldest >= self.max_delay:
                        take, keep, acc = [], [], 0
                        for item in queue:
                            if acc < self.max_batch:
                                take.append(item)
                                acc += item[1].r.shape[0]
                            else:
                                keep.append(item)
                        self._queues[snr] = keep
                        self._pending -= acc
                        work.append((snr, take))
            for snr, batch in work:
                self._flush(snr, batch)
                flushed = True
            if not flushed:
                time.sleep(0.0005)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)
