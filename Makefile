.PHONY: install test test-fast lint bench

install:
	pip install -e . --no-build-isolation --no-deps

test:
	python -m pytest -x -q tests

test-fast:
	python -m pytest -x -q tests -m "not slow" --ignore=tests/test_parallel

lint:
	python -m compileall -q clip_retrieval_tpu
	python -c "import pkgutil, importlib, clip_retrieval_tpu as p; \
[importlib.import_module(m.name) for m in pkgutil.walk_packages(p.__path__, 'clip_retrieval_tpu.')]"

bench:
	python bench.py
