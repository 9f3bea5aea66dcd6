#!/bin/bash
# Round-2 VERDICT item 5: full-D (D=64) reference parity runs for MFA and quant-GMM.
cd /root/repo
echo "=== MFA D=64 parity start $(date) ==="
PARITY_N_ANT=64 PARITY_K=64 PARITY_LATENT=16 PARITY_NTRAIN=30000 PARITY_NVAL=2000 PARITY_MAXITER=60 \
  python tools/parity_mfa.py > results/parity_r2/mfa_d64.log 2>&1
echo "mfa exit: $?"
echo "=== quant-GMM D=64 parity start $(date) ==="
PARITY_N_ANT=64 PARITY_K=64 PARITY_NTRAIN=20000 PARITY_NVAL=2000 PARITY_MAXITER=20 \
  python tools/parity_gmm_quant.py > results/parity_r2/gmm_quant_d64.log 2>&1
echo "quant exit: $?"
echo "=== done $(date) ==="
