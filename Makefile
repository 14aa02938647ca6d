# Build / test entry points (reference role: the reference's top-level
# Makefile cmake/make aresd targets).

PY ?= python

.PHONY: all native test test-all bench clean

all: native

# the native runtime library also self-builds on first import; this target
# exists for image builds where imports must never hit a compiler
native: aresdb_tpu/native/libaresnative.so

aresdb_tpu/native/libaresnative.so: aresdb_tpu/native/cuckoo_index.cpp
	g++ -O3 -march=native -std=c++17 -shared -fPIC $< -o $@

test:
	$(PY) -m pytest tests/ -x -q

# every execution-path override (see .claude/skills/verify/SKILL.md)
test-all:
	$(PY) -m pytest tests/ -q
	ARES_FACTORED=1 $(PY) -m pytest tests/ -q
	ARES_MESH=1 $(PY) -m pytest tests/ -q
	ARES_NATIVE=0 $(PY) -m pytest tests/ -q
	ARES_PREFIX=0 $(PY) -m pytest tests/ -q
	ARES_FUSED=interp $(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

clean:
	rm -f aresdb_tpu/native/libaresnative.so
