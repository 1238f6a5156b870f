# Build/test entry points (the analogue of the reference's autotools layer,
# configure.ac / Makefile.am).  The Python package needs no build; `native`
# compiles the C++ oracle and YUV I/O libraries that hevcasm_tpu/native.py
# and hevcasm_tpu/io.py otherwise build on demand.

CXX ?= g++
CC ?= gcc
CXXFLAGS ?= -O2 -shared -fPIC

NATIVE_LIBS = native/libhevcref.so native/libyuvio.so

# The upstream reference tree, consumed in place (read-only) to build the
# differential-test oracle libhevcasm_cref.so.  Override REFERENCE= to point
# elsewhere; the oracle targets are skipped when the tree is absent.
REFERENCE ?= /root/reference
REF_LIB = $(REFERENCE)/src/lib
CREF_MODULES = sad ssd diff hadamard quantize residual_decode pred_inter pred_intra
CREF_OBJS = $(addprefix native/build/cref_, $(addsuffix .o, $(CREF_MODULES)))
CREF_CFLAGS = -O2 -fPIC -I $(REF_LIB) -I $(REF_LIB)/libvpx/config/gcc -I $(REF_LIB)/libvpx

.PHONY: all native cref test selftest bench clean

all: native

native: $(NATIVE_LIBS)
	@if [ -d $(REF_LIB) ]; then $(MAKE) cref; else echo "reference tree absent; skipping cref oracle"; fi

cref: native/libhevcasm_cref.so

native/libhevcref.so: native/hevcref.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

native/libyuvio.so: native/yuv_io.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

native/build/cref_%.o: $(REF_LIB)/%.c
	@mkdir -p native/build
	$(CC) $(CREF_CFLAGS) -c -o $@ $<

# Aborting stubs for the x86 asm symbols the reference's populate functions
# take addresses of; never invoked under the HEVCASM_C_REF mask.
native/build/cref_stubs.c: $(CREF_OBJS)
	@echo '#include <stdlib.h>' > $@
	@nm -u $(CREF_OBJS) | grep -oE '(hevcasm|f265|vp9)_[a-z0-9_]+' | sort -u \
	  | sed 's/.*/void &(void) { abort(); }/' >> $@

native/libhevcasm_cref.so: native/cref_shim.c native/build/cref_stubs.c $(CREF_OBJS)
	$(CC) $(CREF_CFLAGS) -shared -o $@ native/cref_shim.c native/build/cref_stubs.c $(CREF_OBJS)

test: native
	python -m pytest tests/ -q

selftest:
	python -m hevcasm_tpu selftest

bench:
	python bench.py

clean:
	rm -f $(NATIVE_LIBS) native/libhevcasm_cref.so
	rm -rf native/build
	find . -name __pycache__ -type d -exec rm -rf {} +
