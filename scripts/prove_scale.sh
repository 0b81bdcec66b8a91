#!/bin/bash
# Config-5 scale campaign runner (BASELINE.json config 5; target 2^22 rows,
# staged at 2^21 first).  Encodes the memory discipline learned in the
# round-3 campaign (BASELINE.md "Config-5 scale campaign"):
#   QUILL_BASIS8_DROP12   free 12-bit CRS chunks once repacked to 8-bit
#   QUILL_MSM_SHIFT_MAX   never materialize a shifted basis above 2^20 pts
#   QUILL_SC8_MAX_LOG2    stream the 12-bit sumcheck path above 2^20
#   QUILL_OPEN_BATCH=2    at most two full-size S-polys in flight
# plus the round-4 structural fixes: poly_mul_ntt holds <= 2 full vectors,
# batched quotients consume scans as they land, fused grouped openings.
#
# Usage:  LOG2=21 bash scripts/prove_scale.sh   (default 21)
set -u
cd "$(dirname "$0")/.."
# plain `python` on PATH may be a bare interpreter without numpy
# (CLAUDE.md round-5 landmine); prefer the project venv
PY="${QUILL_PYTHON:-$([ -x /opt/venv/bin/python ] && echo /opt/venv/bin/python || echo python)}"
LOG2="${LOG2:-21}"
LOG="${QUILL_SCALE_LOG:-/tmp/prove_scale_${LOG2}.log}"
echo "scale prove 2^${LOG2} rows -> $LOG"
QUILL_BASIS8_DROP12=1 \
QUILL_MSM_SHIFT_MAX=$((1 << 20)) \
QUILL_SC8_MAX_LOG2=20 \
QUILL_OPEN_BATCH="${QUILL_OPEN_BATCH:-1}" \
QUILL_KZG_OPEN_GROUP="${QUILL_KZG_OPEN_GROUP:-2}" \
QUILL_PROVE_LOG2_ROWS="$LOG2" \
QUILL_PROOF_OUT="/tmp/quill_proof_${LOG2}.bin" \
PYTHONPATH=.:/root/.axon_site \
timeout "${QUILL_SCALE_TIMEOUT:-5400}" "$PY" scripts/prove_tpu.py 2>&1 | tee "$LOG"
