# raytpu build / test / bench entry points.
# The Python package needs no build; `native` compiles the C++ host
# runtime (raytpu/native.py also does this on demand at import).

NATIVE_SRC := native/rt_native.cpp
NATIVE_LIB := native/_rt_native.so

.PHONY: all native test bench clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	g++ -O3 -shared -fPIC -std=c++17 -o $@ $<

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f $(NATIVE_LIB)
