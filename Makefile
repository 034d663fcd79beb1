# `time` below is the bash keyword: /bin/sh on this image has no time
# builtin and /usr/bin/time is not installed.
SHELL := /bin/bash

.PHONY: help test test-full train-ljspeech train-ljspeech-min bench native clean format lint

help:	## Show this help
	@grep -E '^[a-zA-Z_-]+:.*?## .*$$' $(MAKEFILE_LIST) | awk 'BEGIN {FS = ":.*?## "}; {printf "%-24s %s\n", $$1, $$2}'

native:	## Build the C++/OpenMP MAS host kernel
	g++ -O3 -fopenmp -shared -fPIC native/mas/mas.cpp -o native/mas/libmas.so

test:	## Run fast tests (recorded budget: <=6 min warm cache; see TODO.md)
	time python -m pytest tests/ -q -m "not slow"

test-full:	## Run all tests (recorded budget: <=25 min warm cache; see TODO.md)
	time python -m pytest tests/ -q

train-ljspeech:	## Train on LJ Speech
	python -m matcha_tpu.train experiment=ljspeech run_name=ljspeech

train-ljspeech-min:	## Train on LJ Speech with reduced memory (segment cut)
	python -m matcha_tpu.train experiment=ljspeech_min_memory run_name=ljspeech_min

bench:	## One-chip synthesis throughput benchmark
	python bench.py

format:	## Normalize whitespace (no external formatters installed)
	@find matcha_tpu tests -name '*.py' -exec sed -i 's/[ \t]*$$//' {} +

lint:	## Syntax-check + ruff if available (pre-commit config in .pre-commit-config.yaml)
	@python -m compileall -q matcha_tpu tests && echo "compileall OK"
	@command -v ruff >/dev/null 2>&1 && ruff check matcha_tpu tests || echo "ruff not installed; skipped" 

clean:	## Remove caches and build artifacts
	rm -rf .pytest_cache **/__pycache__ native/mas/libmas.so build dist *.egg-info
