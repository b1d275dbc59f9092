.PHONY: install test test-fast lint bench

install:
	pip install -e . --no-build-isolation --no-deps

test:
	python -m pytest -x -q tests

test-fast:
	python -m pytest -x -q tests -m "not slow" --ignore=tests/test_parallel

# Parity with the reference lint gate (mypy + pylint + black in its
# Makefile): tools/lint.py is the always-available first-party layer
# (AST defect checks + style), and mypy/black run when installed — this
# image has no network egress, so they skip with a notice instead of
# failing the target.
lint:
	python tools/lint.py clip_retrieval_tpu tools bench.py __graft_entry__.py
	python -m compileall -q clip_retrieval_tpu
	python -c "import pkgutil, importlib, clip_retrieval_tpu as p; \
[importlib.import_module(m.name) for m in pkgutil.walk_packages(p.__path__, 'clip_retrieval_tpu.')]"
	@python -c "import mypy" 2>/dev/null \
	    && python -m mypy clip_retrieval_tpu \
	    || echo "lint: mypy not installed in this image — skipped"
	@python -c "import black" 2>/dev/null \
	    && python -m black --check -l 120 clip_retrieval_tpu tools \
	    || echo "lint: black not installed in this image — skipped"

bench:
	python bench.py
