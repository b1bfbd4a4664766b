#!/usr/bin/env bash
# Post-outage TPU runbook: validate the fused-encoder kernel on real
# hardware and record its A/Bs. Run when the axon tunnel is back
# (probe: timeout 60 python -c "import jax; print(jax.devices())").
#
# Sequence:
#  1. Mosaic compile + numeric check of every Pallas kernel.
#  2. The isolated eval + serve phases (fused-vs-xla A/Bs land in the
#     phase JSON: eval_encoder_ab, serve_tick_encoder_ab_us).
#  3. Full bench (all phases, one JSON line).
# Then, BY HAND, apply the A/B verdict:
#  - fused wins eval  → Trainer.use_fused_encoder default: None → on_tpu()
#    (engine.py), and record the numbers in ops/pallas_ops.py §2 + README.
#  - fused wins serve → StreamingEngine use_fused_encoder default likewise.
#  - batched §4 wins (serve_multi_chain_ab_ms) → BatchedStreamingEngine
#    use_fused_encoder default likewise; record in the §4 banner.
#  - fused loses      → keep defaults OFF and record the losing numbers in
#    the §2/§4 banner (the deleted-gather-kernel precedent).
#  - sweep f32_rbg leg (sweep_ab.f32_rbg) wins ≥5 % over f32 → record the
#    number in README's perf table next to the --prng_impl flag docs; the
#    DEFAULT stays threefry2x32 either way (stream reproducibility) — rbg
#    is an opt-in knob, so this verdict only updates documentation.
set -e
cd "$(dirname "$0")/.."
echo "== 1. kernel compile check =="
./scripts/tpu_kernel_check.sh
echo "== 2. eval + serve phases (A/Bs) =="
python bench.py --phase eval
python bench.py --phase serve
echo "== 3. full bench =="
python bench.py
echo "== 4. train-step op attribution (fused-train-kernel go/no-go) =="
python scripts/trace_train.py --epochs 20
python scripts/trace_train.py --epochs 20 --compute_dtype bfloat16
