#!/bin/bash
# One-command TPU hardware session: the moment the tunnel relay returns,
# run the round's entire hardware-validation backlog in value order, each
# step bounded and logged. Strictly sequential (single-tenant tunnel, one
# CPU core — concurrent python jobs serialize and can wedge the relay).
#
# ROUND-5 STATUS: this backlog was fully harvested on 2026-08-20 and every
# A/B adjudicated — see PERF.md "Round 5". Decisions: colonnade keeps the
# packet kernel (stream ladder 1.12/1.59/2.01 vs 2.90); EAW fusion stays
# off (loses everywhere, "1" OOMs VMEM at 1080p); bf16/fp16/u32 storage
# variants are all <=1.1% (defaults stay exact); direct512's product path
# is render_loop (in --all as direct512_loop16). Re-running this script is
# only useful to re-validate after kernel changes. CAVEAT for any timing
# work: the tunnel REPLAYS repeated identical execute requests and even
# input-perturbed async loop dispatches — see bench.py's loop-mode
# measurement design before trusting any new number.
#
#   bash tools/hw_session.sh [logfile]
#
# Order rationale:
#   1. flagship bench — BENCH_r04's own config; captures the round's
#      headline number and warms the persistent XLA cache the driver's
#      end-of-round bench.py run will hit.
#   2. tpu_smoke — compiled-kernel gate (Mosaic-only regressions).
#   3. profile_stream — FIRST-EVER hardware compile of ops/stream.py
#      (dynamic-index pend rows + DMA loops are the lowering risk) and the
#      stream-vs-packet colonnade A/B that decides the config flip.
#   4. bench --all — per-config lines for PERF.md.
#   5. profile_textured — f32 vs u32 atlas A/B (decides textured flip).
# A step that fails does not block later steps (independent evidence).

set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_session.log}

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
run() { # run <timeout-s> <label> <cmd...>
  local t=$1 label=$2; shift 2
  say "=== $label (timeout ${t}s): $*"
  local t0=$SECONDS
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  say "=== $label done rc=$rc in $((SECONDS - t0))s"
  return $rc
}

say "hw_session start"

# 0. don't stack onto a running CPU test suite
if [ -f /tmp/suite.pid ] && kill -0 "$(cat /tmp/suite.pid)" 2>/dev/null; then
  say "waiting for test suite pid $(cat /tmp/suite.pid) to finish"
  while kill -0 "$(cat /tmp/suite.pid)" 2>/dev/null; do sleep 30; done
fi

# 1. bounded backend probe — abort early if the relay is still dead.
# 360s: a healthy relay with a cold compile cache measured 107s for the
# first tiny reduction (round 5) — 120s misclassified it as down.
if ! run 360 probe python -c "
import jax, jax.numpy as jnp
d = jax.devices()
assert float(jnp.ones((8,128)).sum()) == 1024.0
print('PROBE_OK', d[0].platform)"; then
  say "backend still unavailable; aborting"
  exit 1
fi

run 2400 bench-flagship python bench.py
run 1800 tpu-smoke python tools/tpu_smoke.py
run 3000 profile-stream python tools/profile_stream.py
run 4800 bench-all python bench.py --all
# product-level colonnade stream A/B (ops-level decision: profile-stream);
# block 32 vs 64: sim says 64 halves steps at 2x per-step cost (PERF.md)
run 3600 bench-colonnade-stream python bench.py --config colonnade_stream
run 3600 bench-colonnade-stream64 python bench.py --config colonnade_stream64
run 1800 profile-textured python tools/profile_textured.py
run 1800 profile-progressive python tools/profile_1080p.py \
  --width 1024 --height 1024 --lowres-indirect
# fused EAW stage-pair A/B (same math, half the stencil dispatches/traffic)
run 1200 bench-progressive-fused \
  env CAPSAICIN_EAW_FUSED=1 python bench.py --config progressive
run 1200 bench-progressive-ctl python bench.py --config progressive
run 1200 bench-flagship-fused env CAPSAICIN_EAW_FUSED=1 python bench.py
# "13" fuses only the narrow (1+3) pair — the fallback if the (5+7)
# pair's n_side=3 slab blows VMEM or regresses
run 1200 bench-flagship-fused13 env CAPSAICIN_EAW_FUSED=13 python bench.py
# render_loop(16) product frame loop: amortizes the ~1-2 ms host/tunnel
# dispatch cost (round 3: direct512 148.4 -> 181.2); fixed-chunk dispatch
# keeps it two compiled programs for any frame count
run 1200 bench-direct512-loop16 python bench.py --config direct512_loop16
run 2400 bench-flagship-loop16 python bench.py --frames-per-dispatch 16
run 1200 bench-progressive-loop16 python bench.py --config progressive_loop16
run 1200 bench-textured-loop16 python bench.py --config textured_loop16
# fp16 temporal history (the reference's literal RGBA16F storage):
# halves SVGF/TAA history HBM traffic on the flagship
run 1200 bench-flagship-fp16hist python bench.py --config gi1080_fp16hist
# bf16 planar storage for the EAW chain (compute stays f32): halves the
# chain's HBM traffic; composable with FUSED (independent A/B first)
run 1200 bench-flagship-bf16 env CAPSAICIN_EAW_BF16=1 python bench.py
run 1200 bench-progressive-bf16 \
  env CAPSAICIN_EAW_BF16=1 python bench.py --config progressive
run 1200 bench-progressive-bf16-fused \
  env CAPSAICIN_EAW_BF16=1 CAPSAICIN_EAW_FUSED=1 \
  python bench.py --config progressive
# block-128 stream leaves (sim: bounce 194.6 steps/gang vs 364 at b64 /
# 809 at b32, at 4x/2x/1x per-step MT cost — bigger blocks win if fixed
# per-step overhead dominates); lower priority than the 32/64 ladder
run 2400 profile-stream-b128 python tools/profile_stream.py --blocks 128
run 3600 bench-colonnade-stream128 python bench.py --config colonnade_stream128

say "hw_session complete — read $LOG, decide colonnade/textured config flips"
