"""Blocking vs pipelined EM-statistics psum on a REAL 2-process cluster
(round-2 VERDICT item 2).

The virtual 8-device mesh validates `psum_segments` exactness but its
collectives are free (one shared CPU); this tool launches a 2-process
jax.distributed CPU cluster (Gloo over loopback — the only transport on
this machine where an all-reduce costs real wall-clock) and times the
data-parallel GMM EM (`parallel.mesh.fit_gmm_shard_map`) with
psum_segments in {1, 4}, plus the BARE all-reduce of one iteration's
statistics payload as the communication floor.

The regime is chosen so communication is a visible fraction of an EM
iteration: large D (payload ~ K D^2 complex, 16 MB at K=32/D=256) and a
small per-process batch. On a 2-CPU host both workers contend for cores —
identical contention on both variants, so the blocking-vs-pipelined DELTA
is meaningful even though absolute times are not.

Usage:
    python tools/psum_overlap_bench.py               # launcher (2 workers)
    python tools/psum_overlap_bench.py --worker P ID # internal

Evidence recorded in BASELINE.md ("2-host scaling efficiency" row).
"""
import os
import pathlib
import socket
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

D = int(os.environ.get("OVERLAP_D", 256))
K = int(os.environ.get("OVERLAP_K", 16))
N_LOCAL = int(os.environ.get("OVERLAP_NLOCAL", 128))
N_ITER = int(os.environ.get("OVERLAP_ITERS", 10))
REPS = int(os.environ.get("OVERLAP_REPS", 7))
# 'auto' (round-5) must land on the measured winner of the regime chosen by
# OVERLAP_* — 1 in the small-collective default, 4 at the 16 MB/D=512 one
SEGMENTS = (1, 4, "auto")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launcher():
    port = _free_port()
    env = {**os.environ, "XLA_FLAGS": ""}  # workers model one chip per host
    # pin each worker to its own core: without pinning the two multithreaded
    # XLA runtimes thrash the 2-CPU host and rep times vary 5-8x, burying
    # any communication-level effect (measured)
    n_cpu = os.cpu_count() or 1
    pin = (lambda pid: ["taskset", "-c", str(pid % n_cpu)]) if n_cpu >= 2 \
        else (lambda pid: [])
    procs = [subprocess.Popen(
        pin(pid) + [sys.executable, __file__, "--worker", str(port),
                    str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise SystemExit("workers timed out:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise SystemExit(f"worker failed rc={p.returncode}:\n"
                             + out[-4000:])
    print(outs[0], end="")  # pid 0 carries the report


def median(xs):
    return sorted(xs)[len(xs) // 2]


def worker(port: str, pid: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from quantized_channel_estimation_tpu.parallel import distributed as dist
    dist.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from quantized_channel_estimation_tpu.models import gmm
    from quantized_channel_estimation_tpu.parallel import mesh as pmesh

    mesh = dist.global_mesh()
    n_shards = mesh.shape[pmesh.DATA_AXIS]
    n_total = N_LOCAL * n_shards

    rng = np.random.default_rng(0)
    h_local = (rng.standard_normal((N_LOCAL, D))
               + 1j * rng.standard_normal((N_LOCAL, D))).astype(np.complex64)
    h = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(pmesh.DATA_AXIS)), h_local, (n_total, D))

    def report(msg):
        if pid == 0:
            print(msg, flush=True)

    # communication floor: one bare all-reduce of the per-iteration
    # statistics payload (Nk (K,), means (K, D), scatter (K, D, D) complex
    # as re/im f32 pairs — matches _Stats at cov_type='full')
    payload = [jnp.zeros((K,), jnp.float32),
               jnp.zeros((K, D, 2), jnp.float32),
               jnp.zeros((K, D, D, 2), jnp.float32)]
    payload = [jax.device_put(x, NamedSharding(mesh, P())) for x in payload]
    try:
        from jax import shard_map
        rep_kwargs = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kwargs = {"check_rep": False}

    @jax.jit
    def bare_psum(xs):
        f = shard_map(
            lambda *ys: tuple(jax.lax.psum(y, pmesh.DATA_AXIS) for y in ys),
            mesh=mesh, in_specs=(P(),) * len(xs), out_specs=(P(),) * len(xs),
            **rep_kwargs)
        return f(*xs)

    out = bare_psum(payload)  # compile
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS * 2):
        t0 = time.perf_counter()
        jax.block_until_ready(bare_psum(payload))
        ts.append(time.perf_counter() - t0)
    t_allreduce = median(ts)
    mb = sum(int(np.prod(x.shape)) * 4 for x in payload) / 2 ** 20
    report(f"bare stats all-reduce ({mb:.1f} MB, K={K}, D={D}): "
           f"{t_allreduce * 1e3:.1f} ms")

    times = {}
    for segs in SEGMENTS:
        # chunk so the LOCAL stream has >= 8 chunks — with chunk_size >=
        # N_local, segmented_psum_scan silently clamps every segment count
        # to 1 and the "pipelined" run is program-identical to blocking
        # (this artifact produced the round-3 "pipelining wins at 16 MB"
        # record: both D=512 runs printed the same lb because they WERE the
        # same program — retracted in BASELINE.md round-5)
        cfg = gmm.GmmConfig(n_components=K, zero_mean=True, max_iter=N_ITER,
                            tol=0.0, init="random",
                            chunk_size=max(8, N_LOCAL // 8),
                            psum_segments=segs)

        def fit_once():
            r = pmesh.fit_gmm_shard_map(mesh, jax.random.PRNGKey(1), h, cfg)
            jax.block_until_ready(r.lower_bound)
            return r

        r0 = fit_once()  # compile
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fit_once()
            ts.append(time.perf_counter() - t0)
        times[segs] = median(ts)
        report(f"EM {N_ITER} iters (N_local={N_LOCAL}, K={K}, D={D}), "
               f"psum_segments={segs}: {times[segs]:.3f}s "
               f"(lb={float(r0.lower_bound):.3f}, "
               f"reps={[f'{t:.3f}' for t in ts]})")

    if "auto" in times:
        from quantized_channel_estimation_tpu.models.gmm import (
            _resolve_segments)
        resolved = _resolve_segments("auto")
        report(f"'auto' resolved to {resolved} segments; "
               f"auto {times['auto']:.3f}s vs explicit "
               f"{times[resolved]:.3f}s (same program)")
    t1, t4 = times[SEGMENTS[0]], times[SEGMENTS[1]]
    per_iter_comm = t_allreduce * N_ITER
    report(f"summary: blocking {t1:.3f}s vs pipelined(4) {t4:.3f}s -> "
           f"delta {(t1 - t4) * 1e3:+.0f} ms over {N_ITER} iters "
           f"({100 * (t1 - t4) / max(t1, 1e-9):+.1f}%); bare communication "
           f"is {per_iter_comm:.3f}s of the blocking run "
           f"({100 * per_iter_comm / max(t1, 1e-9):.1f}%) — an overlap "
           f"delta can be at most that fraction on this transport")
    print(f"WORKER_OK pid={pid}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]))
    else:
        launcher()
