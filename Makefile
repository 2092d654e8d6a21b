# pg_embedding_tpu build/test targets (the PGXS Makefile analog)

PY ?= python

.PHONY: all test test-fast bench native ci clean dist

all: native

native: csrc/build/libhnsw_ref.so

csrc/build/libhnsw_ref.so: csrc/hnsw_ref.cpp
	mkdir -p csrc/build
	g++ -O3 -march=native -std=c++17 -shared -fPIC $< -o $@

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -k "not sharded and not parity"

bench:
	$(PY) bench.py

# execute .github/workflows/ci.yml's steps verbatim and regenerate
# CI_RUN.md (tools/run_ci.py — the no-GitHub-runner CI gate)
ci:
	$(PY) tools/run_ci.py

clean:
	rm -rf csrc/build __pycache__ .pytest_cache
	find . -name '__pycache__' -type d -exec rm -rf {} +

dist: clean
	git archive --format=zip -o pg_embedding_tpu.zip HEAD
