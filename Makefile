# Developer entry points (the reference ships lint/format targets only,
# Makefile:26-32; here tests and the native build are first-class).

.PHONY: test native bench lint clean parity parity-quick parity-real \
	parity-hscn-compat parity-matrix \
	parity-dry

test:
	python -m pytest tests/ -q

# Core iteration suite (<5 min): kernels, parity oracles, batching, one
# sharded family.  The full suite stays the round gate.
test-quick:
	python -m pytest tests/ -q -m "quick and not slow"

native:
	$(MAKE) -C native

bench:
	python bench.py

# AP-parity verdict vs the mounted reference, EXECUTED in-image: the
# reference's own code runs on pure-torch shims of its PyG/OGB deps
# (scripts/ref_shim/), both sides on one shared synthetic dataset, with
# an 8x7-seed study (the statistic that can resolve the 0.005 gate —
# see PARITY_RESULT.json seed_study.note).  DATASET=peptides_struct and
# MODEL=gat/hscn select other parity pairs.
DATASET ?= peptides_func
MODEL ?= gcn
PARITY_ARGS ?=
parity:
	python scripts/parity_run.py --mode shim --dataset $(DATASET) \
	  --model $(MODEL) --ref-seeds 0,1,2,3,4,5,6,7 \
	  --fw-seeds 0,1,2,3,4,5,6,7 $(PARITY_ARGS) --out PARITY_RESULT.json

# Quirk-faithful HSCN pair (compat.cluster_index_shift on, the
# PARITY_MATRIX peptides_func/hscn entry); the plain `make parity
# MODEL=hscn` run keeps the shipped quirk-8-FIXED config and lands
# above the reference (peptides_func/hscn+quirk8_fixed entry).
parity-hscn-compat:
	python scripts/parity_run.py --mode shim --model hscn \
	  --num-graphs 256 \
	  --framework-cfg configs/HSCN/peptides_func_HSCN_parity.yaml \
	  --ref-seeds 0,1,2,3,4,5,6,7 --fw-seeds 0,1,2,3,4,5,6,7 \
	  $(PARITY_ARGS) --out PARITY_RESULT.json

# Re-assemble PARITY_MATRIX.json from the committed study artifacts.
parity-matrix:
	python scripts/build_parity_matrix.py

# Single-seed quick variant (one reference + one framework run).
parity-quick:
	python scripts/parity_run.py --mode shim --dataset $(DATASET) \
	  --model $(MODEL) --ref-seed 0 --out PARITY_RESULT.json

# Real-LRGB variant for a networked RDKit + torch_geometric host.
parity-real:
	python scripts/parity_run.py --mode cli --dataset $(DATASET) \
	  --out PARITY_RESULT.json

# Orchestration dry run (stubbed reference; CI smoke).
parity-dry:
	python scripts/parity_run.py --dry-run --out PARITY_RESULT.json

lint:
	python -m flake8 graph_hscn_tpu tests --max-line-length 79 \
	  --extend-ignore E203,W503 || true

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
