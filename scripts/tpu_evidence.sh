#!/bin/bash
# Round-evidence runner: waits for the axon TPU to come back, then runs
# every TPU-dependent artifact in sequence (one job at a time — the
# remote worker time-shares concurrent clients):
#   1. bench.py                 -> headline k=13 prove/verify JSON
#   2. CLI quickstart at k=13   -> configs/bfv.json + data/bfv.{vk,pk,snark}
#      (VERDICT round-2 weak #9: the documented quick start had never
#      been run against the real artifact store)
#   3. scripts/bench_k15.py     -> data/k15_result.json (BASELINE item 3)
#   4. scripts/bench_batch.py   -> data/batch_result.json (BASELINE item 4)
# Each step under timeout; progress to /tmp/tpu_evidence.log.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "waiting for TPU..."
while true; do
  out=$(timeout 180 python -c "
import jax, numpy as np, jax.numpy as jnp
print(np.asarray(jnp.arange(4)+2))" 2>&1 | tail -1)
  if echo "$out" | grep -q '\[2 3 4 5\]'; then log "TPU ALIVE"; break; fi
  log "probe: $out"
  sleep 300
done

# host contention inflates every prover stage ~2x (the host loop's tiny
# syncs are the bottleneck) — wait for any CPU-heavy test runs to finish
while pgrep -x pytest >/dev/null || pgrep -f "pytest tests/" >/dev/null; do
  log "waiting for pytest to finish (host contention)"
  sleep 120
done

log "=== 1. bench.py ==="
timeout 7200 env ZKFHE_LOG=1 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.log
log "bench rc=$? json=$(cat /tmp/bench_r3.json)"

log "=== 2. CLI quickstart k=13 ==="
timeout 1200 python -m zkfhe_tpu --name bfv -k 13 --input bfv/bfv.in mock \
  && log "mock OK" || log "mock FAILED rc=$?"
timeout 3600 python -m zkfhe_tpu --name bfv -k 13 --input bfv/bfv_empty.in keygen \
  && log "keygen OK" || log "keygen FAILED rc=$?"
timeout 3600 python -m zkfhe_tpu --name bfv -k 13 --input bfv/bfv.in prove \
  && log "prove OK" || log "prove FAILED rc=$?"
timeout 1200 python -m zkfhe_tpu --name bfv -k 13 --input bfv/bfv_empty.in verify \
  && log "verify OK" || log "verify FAILED rc=$?"

log "=== 3. bench_k15 ==="
timeout 10800 python scripts/bench_k15.py > /tmp/k15_r3.log 2>&1
log "k15 rc=$? result=$(cat data/k15_result.json 2>/dev/null)"

log "=== 4. bench_batch ==="
timeout 7200 python scripts/bench_batch.py > /tmp/batch_r3.log 2>&1
log "batch rc=$? result=$(cat data/batch_result.json 2>/dev/null)"

log "ALL EVIDENCE DONE"
