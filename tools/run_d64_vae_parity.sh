#!/bin/bash
# Follow-on to run_d64_parity.sh: D=64 VAE noisy/real parity vs the torch
# reference (reduced epochs/samples — the reference trains ~10x slower on CPU).
cd /root/repo
# wait for the MFA/quant-GMM D=64 runs to release the CPUs
while pgrep -f "tools/run_d64_parity.sh" > /dev/null; do sleep 60; done
echo "=== VAE D=64 parity start $(date) ==="
PARITY_N_ANT=64 PARITY_NTRAIN=20000 PARITY_NVAL=2000 PARITY_EPOCHS=60 \
  python -u tools/parity_vae_modes.py both > results/parity_r2/vae_modes_d64.log 2>&1
echo "vae modes exit: $?"
PARITY_N_ANT=64 PARITY_NTRAIN=20000 PARITY_NVAL=2000 PARITY_EPOCHS=60 \
  python -u tools/parity_vae.py > results/parity_r2/vae_genie_d64.log 2>&1
echo "vae genie exit: $? === done $(date)"
