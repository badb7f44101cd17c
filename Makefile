# Developer entry points (the reference ships lint/format targets only,
# Makefile:26-32; here tests and the native build are first-class).

.PHONY: test native bench lint clean parity parity-dry

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

# Real-data AP-parity verdict vs the mounted reference (needs network +
# RDKit + torch_geometric on the host): convert -> reference train ->
# framework train -> PARITY_RESULT.json with the 0.005 gate.
parity:
	python scripts/parity_run.py --dataset peptides_func \
	  --out PARITY_RESULT.json

# Orchestration dry run (no network/RDKit; synthetic data + stubbed
# reference) — what CI and this environment can execute.
parity-dry:
	python scripts/parity_run.py --dry-run --out PARITY_RESULT.json

lint:
	python -m flake8 graph_hscn_tpu tests --max-line-length 79 \
	  --extend-ignore E203,W503 || true

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
