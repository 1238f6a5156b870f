/* cref_shim: flat C entry points over the ACTUAL kupix/hevcasm reference C
 * implementations, for differential testing of hevcasm_tpu's tiers against
 * the genuine upstream semantics (not our own transcriptions).
 *
 * Build: compiles /root/reference/src/lib/{sad,ssd,diff,hadamard,quantize,
 * residual_decode,pred_inter,pred_intra}.c unmodified (see Makefile target
 * native/libhevcasm_cref.so), links them with auto-generated aborting stubs
 * for the x86 asm symbols their populate functions reference, and calls
 * each family through hevcasm_populate_*(table, HEVCASM_C_REF) +
 * hevcasm_get_*, exactly as a client codec would (SURVEY.md section 3.2-3.4).
 * With the C_REF-only mask no asm symbol is ever invoked.
 *
 * The reference tree is consumed in place (read-only); no reference code is
 * copied into this repository.
 */

#include <stdint.h>
#include <stddef.h>

#include "hevcasm.h"
#include "sad.h"
#include "ssd.h"
#include "diff.h"
#include "hadamard.h"
#include "quantize.h"
#include "residual_decode.h"
#include "pred_inter.h"
#include "pred_intra.h"

#define EXPORT __attribute__((visibility("default")))

EXPORT int cref_sad(const uint8_t *src, ptrdiff_t ss,
                    const uint8_t *ref, ptrdiff_t sr, int w, int h) {
  hevcasm_table_sad t;
  hevcasm_populate_sad(&t, HEVCASM_C_REF);
  hevcasm_sad *f = *hevcasm_get_sad(&t, w, h);
  return f(src, ss, ref, sr, HEVCASM_RECT(w, h));
}

EXPORT void cref_sad_multiref(const uint8_t *src, ptrdiff_t ss,
                              const uint8_t *ref0, const uint8_t *ref1,
                              const uint8_t *ref2, const uint8_t *ref3,
                              ptrdiff_t sr, int *sad_out, int w, int h) {
  hevcasm_table_sad_multiref t;
  hevcasm_populate_sad_multiref(&t, HEVCASM_C_REF);
  hevcasm_sad_multiref *f = *hevcasm_get_sad_multiref(&t, 4, w, h);
  const uint8_t *refs[4] = {ref0, ref1, ref2, ref3};
  f(src, ss, refs, sr, sad_out, HEVCASM_RECT(w, h));
}

EXPORT int cref_ssd(const uint8_t *a, ptrdiff_t sa,
                    const uint8_t *b, ptrdiff_t sb, int log2size) {
  hevcasm_table_ssd t;
  hevcasm_populate_ssd(&t, HEVCASM_C_REF);
  hevcasm_ssd *f = *hevcasm_get_ssd(&t, log2size);
  int n = 1 << log2size;
  return f(a, sa, b, sb, n, n);
}

EXPORT int cref_ssd_linear(const uint8_t *a, const uint8_t *b, int n) {
  hevcasm_ssd_linear *f = hevcasm_get_ssd_linear(n, HEVCASM_C_REF);
  return f(a, b, n);
}

EXPORT int cref_satd(const uint8_t *a, ptrdiff_t sa,
                     const uint8_t *b, ptrdiff_t sb, int log2size) {
  hevcasm_table_hadamard_satd t;
  hevcasm_populate_hadamard_satd(&t, HEVCASM_C_REF);
  hevcasm_hadamard_satd *f = *hevcasm_get_hadamard_satd(&t, log2size);
  return f(a, sa, b, sb);
}

EXPORT int cref_quantize(int16_t *dst, const int16_t *src, int scale,
                         int shift, int offset, int n) {
  hevcasm_table_quantize t;
  hevcasm_populate_quantize(&t, HEVCASM_C_REF);
  return (*hevcasm_get_quantize(&t))(dst, src, scale, shift, offset, n);
}

EXPORT void cref_quantize_inverse(int16_t *dst, const int16_t *src,
                                  int scale, int shift, int n) {
  hevcasm_table_quantize_inverse t;
  hevcasm_populate_quantize_inverse(&t, HEVCASM_C_REF);
  (*hevcasm_get_quantize_inverse(&t))(dst, src, scale, shift, n);
}

EXPORT void cref_reconstruct(uint8_t *rec, ptrdiff_t sr,
                             const uint8_t *pred, ptrdiff_t sp,
                             const int16_t *res, int log2size) {
  hevcasm_table_quantize_reconstruct t;
  hevcasm_populate_quantize_reconstruct(&t, HEVCASM_C_REF);
  (*hevcasm_get_quantize_reconstruct(&t, log2size))(rec, sr, pred, sp, res,
                                                    1 << log2size);
}

EXPORT void cref_transform(int16_t *coeffs, const int16_t *src,
                           ptrdiff_t src_stride, int tr_type, int log2size) {
  hevcasm_table_transform t;
  hevcasm_populate_transform(&t, HEVCASM_C_REF);
  (*hevcasm_get_transform(&t, tr_type, log2size))(coeffs, src, src_stride);
}

EXPORT void cref_inverse_transform_add(uint8_t *dst, ptrdiff_t sd,
                                       const uint8_t *pred, ptrdiff_t sp,
                                       const int16_t *coeffs, int tr_type,
                                       int log2size) {
  hevcasm_table_inverse_transform_add t;
  hevcasm_populate_inverse_transform_add(&t, HEVCASM_C_REF, 1);
  (*hevcasm_get_inverse_transform_add(&t, tr_type, log2size))(dst, sd, pred,
                                                              sp, coeffs);
}

EXPORT void cref_pred_uni(uint8_t *dst, ptrdiff_t sd, const uint8_t *ref,
                          ptrdiff_t sr, int w, int h, int xfrac, int yfrac,
                          int taps) {
  hevcasm_table_pred_uni_8to8 t;
  hevcasm_populate_pred_uni_8to8(&t, HEVCASM_C_REF);
  hevcasm_pred_uni_8to8 *f =
      *hevcasm_get_pred_uni_8to8(&t, taps, w, h, xfrac, yfrac);
  f(dst, sd, ref, sr, w, h, xfrac, yfrac);
}

EXPORT void cref_pred_bi(uint8_t *dst, ptrdiff_t sd, const uint8_t *ref0,
                         const uint8_t *ref1, ptrdiff_t sr, int w, int h,
                         int xfrac0, int yfrac0, int xfrac1, int yfrac1,
                         int taps) {
  hevcasm_table_pred_bi_8to8 t;
  hevcasm_populate_pred_bi_8to8(&t, HEVCASM_C_REF);
  hevcasm_pred_bi_8to8 *f = *hevcasm_get_pred_bi_8to8(
      &t, taps, w, h, xfrac0, yfrac0, xfrac1, yfrac1);
  f(dst, sd, ref0, ref1, sr, w, h, xfrac0, yfrac0, xfrac1, yfrac1);
}

/* Intra DC, the only mode the reference wires up (pred_intra.c:116-139).
 * neighbours follows the f265 layout read by pred_intra.c:56-62:
 * buf[63 - dy] = left[dy], buf[64 + dx] = above[dx]. */
EXPORT void cref_pred_intra_dc(uint8_t *dst, const uint8_t *neighbours,
                               int log2size, int edge_flag) {
  hevcasm_table_pred_intra t;
  hevcasm_populate_pred_intra(&t, HEVCASM_C_REF);
  hevcasm_pred_intra_packed packed = (8 << 8) | (log2size << 1) | edge_flag;
  hevcasm_pred_intra *f = *hevcasm_get_pred_intra(&t, 1, packed);
  f(dst, neighbours, 1, packed);
}
