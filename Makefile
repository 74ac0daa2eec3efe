.PHONY: all native test test-fast bench bench-cpu train-smoke clean

all: native

# host-side C++ engine (ops/native.py also builds this on demand)
native:
	$(MAKE) -C csrc

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_bits.py tests/test_bitboard.py tests/test_native.py -q

bench:
	python bench.py

bench-cpu:
	python bench.py --platform cpu --batch 4096 --repeats 2

train-smoke:
	python main.py train --config configs/test.yaml

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} +
