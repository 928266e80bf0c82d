# Make targets mirroring the reference's workflow surface
# (/root/reference/Makefile): lint/test, per-experiment train targets, and
# sliding-window test variants. Slurm job-* wrappers become plain local runs
# (TPU VMs are single-host; schedule externally with XPK/GKE if needed).

PY ?= python
CFG_DIR = models/asf/config

.PHONY: lint test-code test-pallas bench bench-smoke train-% test-% slide-%

lint:
	$(PY) -m ruff check asf_tpu tests scripts || true

test-code:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

# CPU smoke of the TPU bench matrix (VERDICT r4 #4): every loader mode x
# dataset x K the sweep drives must reach its report line on tiny geometry
# BEFORE a scarce TPU window pays for a script bug. ~6 min on the 1-core host.
bench-smoke:
	ASF_SMOKE=1 ASF_PLATFORM=cpu ASF_CPU_DEVICES=1 ASF_BENCH_K=16 $(PY) scripts/bench_train_loop.py
	ASF_SMOKE=1 ASF_PLATFORM=cpu ASF_CPU_DEVICES=1 ASF_BENCH_DEVSTORE=0 $(PY) scripts/bench_train_loop.py
	ASF_SMOKE=1 ASF_PLATFORM=cpu ASF_CPU_DEVICES=1 ASF_BENCH_DATASET=epic $(PY) scripts/bench_train_loop.py
	ASF_SMOKE=1 ASF_PLATFORM=cpu ASF_CPU_DEVICES=1 ASF_BENCH_DATASET=gru ASF_BENCH_BATCH=4 $(PY) scripts/bench_train_loop.py

# --- experiment training targets (reference `train-*`) ---
train-asf: ; $(PY) main.py --config $(CFG_DIR)/SLOWFAST_R50.yaml --train
train-asf-gru: ; $(PY) main.py --config $(CFG_DIR)/asf-gru.yaml --train
train-asf-gru-vgg: ; $(PY) main.py --config $(CFG_DIR)/asf-gru-vgg.yaml --train
train-asf-gru-aug: ; $(PY) main.py --config $(CFG_DIR)/asf-gru-augment.yaml --train
train-asf-gru-aug-vgg: ; $(PY) main.py --config $(CFG_DIR)/asf-gru-augment-vgg.yaml --train
train-asf-gru-state: ; $(PY) main.py --config $(CFG_DIR)/asf-gru-state.yaml --train
train-asf-gru-state-vgg: ; $(PY) main.py --config $(CFG_DIR)/asf-gru-state-vgg.yaml --train
train-asf-gru-aug-state: ; $(PY) main.py --config $(CFG_DIR)/asf-gru-augment-state.yaml --train
train-asf-gru-aug-state-vgg: ; $(PY) main.py --config $(CFG_DIR)/asf-gru-augment-state-vgg.yaml --train
train-asf-state: ; $(PY) main.py --config $(CFG_DIR)/asf-state.yaml --train
train-asf-aug: ; $(PY) main.py --config $(CFG_DIR)/asf-augment.yaml --train
train-asf-aug-vgg: ; $(PY) main.py --config $(CFG_DIR)/asf-augment-vgg.yaml --train
train-asf-aug-state: ; $(PY) main.py --config $(CFG_DIR)/asf-augment-state.yaml --train
train-original: ; $(PY) main.py --config $(CFG_DIR)/asf-original-augment.yaml --train

# --- test targets ---
test: ; $(PY) main.py --config $(CFG_DIR)/SLOWFAST_R50.yaml --test
test-per-instance: ; $(PY) main.py --config $(CFG_DIR)/slide/asf-original-per-instance.yaml --test
test-action-bounds: ; $(PY) main.py --config $(CFG_DIR)/slide/asf-original-action-bounds.yaml --test
test-whole-vid-0.5s: ; $(PY) main.py --config "$(CFG_DIR)/slide/asf-original-whole-video-0,5s.yaml" --test
test-whole-vid-1s: ; $(PY) main.py --config $(CFG_DIR)/slide/asf-original-whole-video-1s.yaml --test
test-whole-vid-2s: ; $(PY) main.py --config $(CFG_DIR)/slide/asf-original-whole-video-2s.yaml --test
test-whole-vid-4s: ; $(PY) main.py --config $(CFG_DIR)/slide/asf-original-whole-video-4s.yaml --test
test-whole-vid-8s: ; $(PY) main.py --config $(CFG_DIR)/slide/asf-original-whole-video-8s.yaml --test

# Regenerate the experiment YAML set from the override table.
configs:
	$(PY) scripts/gen_configs.py
