"""Mesh-enabled harness sweep: the standard benchmark, data/tensor-parallel.

Round-5: the user-facing benchmark runners take the parallelism directly —
`n_data_shards` runs the GMM fit data-parallel (EM sufficient statistics
psum'd over the 'data' axis, the data-parallel k-means init bit-identical
to single-device) and `n_component_shards` shards the prepared bank for
estimation (per-shard online-softmax states merged with pmax + psum over
'component'). The reference's only parallelism is a multiprocessing pool
over SNR points (`Bussgang_GMM.py:29-32`); here one knob scales the whole
sweep over a pod slice with CSVs matching the single-device run to f32
summation order.

This script simulates an 8-device mesh on CPU (the standard JAX
fake-cluster technique); on a real slice, drop the simulation lines.

    python examples/10_mesh_harness.py
"""
import os
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")  # simulation; remove on a pod

import dataclasses

from quantized_channel_estimation_tpu.harness import run_gmm

print(f"devices: {len(jax.devices())}")
with tempfile.TemporaryDirectory() as td:
    base = run_gmm.GmmBenchConfig(
        n_antennas=16, n_components=8, n_train=16_000, n_val=2_000,
        snrs=(-10, 0, 10), gmm_max_iter=20, eval_blmmse_genie=False,
        eval_ls_glob=False, eval_rate=False, results_dir=td, cache_dir=td,
        use_cache=False)

    print("single-device sweep...")
    mse_1, _, t_1 = run_gmm.run(base, verbose=False)

    print("4-way data x 2-way component mesh sweep...")
    cfg_m = dataclasses.replace(base, n_data_shards=4, n_component_shards=2)
    mse_m, _, t_m = run_gmm.run(cfg_m, verbose=False)

    print(f"\n{'SNR':>6} {'single-device':>15} {'mesh (4x2)':>12}")
    for i, snr in enumerate(base.snrs):
        print(f"{snr:>6} {mse_1['blmmse_gmm'][i]:>15.5f} "
              f"{mse_m['blmmse_gmm'][i]:>12.5f}")
    rel = max(abs(a - b) / a for a, b in zip(mse_1["blmmse_gmm"],
                                             mse_m["blmmse_gmm"]))
    print(f"\nmax relative CSV difference: {rel:.2e} "
          "(f32 psum summation order)")
    assert rel < 2e-2
