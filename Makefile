# vcp-tpu build/dev targets (role parity with the reference's Makefile:
# build, redis lifecycle, dev producer/consumer loops — reimagined for a
# Python+TPU deployment: no static Go binaries, the embedded mini-redis
# replaces dockerized redis, and the native entropy engine is the compile
# artifact).

PY ?= python
DEV_DIR ?= ./test
REDIS_PORT ?= 6379

.PHONY: help test test-fast bench native clean-native redis-start \
        dev-producer dev-consumer dev-dirs stats clean-queue lint

help:
	@echo "targets:"
	@echo "  test          run the FULL test suite (~30+ min on 1 core)"
	@echo "  test-fast     control-plane + unit gate (< 3 min)"
	@echo "  bench         run the 1080p encode benchmark (one JSON line)"
	@echo "  native        (re)build the C++ entropy engine"
	@echo "  redis-start   run the embedded mini-redis on $(REDIS_PORT)"
	@echo "  dev-producer  watch $(DEV_DIR)/raw -> publish tasks"
	@echo "  dev-consumer  consume + encode into $(DEV_DIR)/encoded"
	@echo "  stats         queue + history statistics"
	@echo "  clean-queue   vcp clean --all --force"

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

bench:
	$(PY) bench.py

native:
	$(PY) -c "from vcp_tpu.native.build import build; print(build(force=True))"

clean-native:
	rm -rf vcp_tpu/native/_build

redis-start:
	$(PY) -m vcp_tpu.cli redis-serve --port $(REDIS_PORT)

dev-dirs:
	mkdir -p $(DEV_DIR)/raw $(DEV_DIR)/shared $(DEV_DIR)/encoded

dev-producer: dev-dirs
	$(PY) -m vcp_tpu.cli producer \
	  --redis 127.0.0.1:$(REDIS_PORT) \
	  -w $(DEV_DIR)/raw -s $(DEV_DIR)/shared -o $(DEV_DIR)/encoded \
	  --log-level debug

dev-consumer:
	$(PY) -m vcp_tpu.cli consumer --redis 127.0.0.1:$(REDIS_PORT) \
	  -j 2 --log-level debug

stats:
	$(PY) -m vcp_tpu.cli stats --redis 127.0.0.1:$(REDIS_PORT)

clean-queue:
	$(PY) -m vcp_tpu.cli clean --redis 127.0.0.1:$(REDIS_PORT) --all --force
