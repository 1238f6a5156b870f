# Build/test entry points (the analogue of the reference's autotools layer,
# configure.ac / Makefile.am).  The Python package needs no build; `native`
# compiles the C++ oracle and YUV I/O libraries that hevcasm_tpu/native.py
# and hevcasm_tpu/io.py otherwise build on demand.

CXX ?= g++
CXXFLAGS ?= -O2 -shared -fPIC

NATIVE_LIBS = native/libhevcref.so native/libyuvio.so

.PHONY: all native test selftest bench clean

all: native

native: $(NATIVE_LIBS)

native/libhevcref.so: native/hevcref.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

native/libyuvio.so: native/yuv_io.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

test: native
	python -m pytest tests/ -q

selftest:
	python -m hevcasm_tpu selftest

bench:
	python bench.py

clean:
	rm -f $(NATIVE_LIBS)
	find . -name __pycache__ -type d -exec rm -rf {} +
