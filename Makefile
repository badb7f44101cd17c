# Developer entry points (the reference ships lint/format targets only,
# Makefile:26-32; here tests and the native build are first-class).

.PHONY: test native bench lint clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

lint:
	python -m flake8 graph_hscn_tpu tests --max-line-length 79 \
	  --extend-ignore E203,W503 || true

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
