.PHONY: install test test-fast lint bench

install:
	pip install -e . --no-build-isolation --no-deps

test:
	python -m pytest -x -q tests

test-fast:
	python -m pytest -x -q tests -m "not slow" --ignore=tests/test_parallel

lint:
	python -m pyflakes clip_retrieval_tpu || true

bench:
	python bench.py
