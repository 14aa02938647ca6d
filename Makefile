# Build / test entry points (reference role: the reference's top-level
# Makefile cmake/make aresd targets).

PY ?= python

.PHONY: all native test test-all bench clean

all: native

# the native runtime library also self-builds on first import; this target
# exists for image builds where imports must never hit a compiler
native: aresdb_tpu/native/libaresnative.so

aresdb_tpu/native/libaresnative.so: aresdb_tpu/native/cuckoo_index.cpp
	g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread $< -o $@

test:
	$(PY) -m pytest tests/ -x -q

# CANONICAL CI variant list — the single source of truth. SKILL.md and the
# round docs reference `make test-all` instead of repeating the list.
# default: XLA kernels | FACTORED: TPU-default dense reduction |
# MESH: multi-chip path | NATIVE=0: python PK fallback |
# FUSED=interp: TPU-default pallas kernels interpreted on CPU |
# PK_PARTS=1: serial (non-partitioned) primary key
VARIANTS = "ARES_DEFAULT=1" "ARES_FACTORED=1" "ARES_MESH=1" \
	"ARES_NATIVE=0" "ARES_FUSED=interp" "ARES_PK_PARTS=1"

test-all:
	@for v in $(VARIANTS); do \
		echo "=== variant: $$v ==="; \
		env $$v $(PY) -m pytest tests/ -q || exit 1; \
	done

bench:
	$(PY) bench.py

clean:
	rm -f aresdb_tpu/native/libaresnative.so
