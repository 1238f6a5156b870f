// hevcref: independent scalar C++ oracle for every hevcasm_tpu kernel
// family.  Plays the role the C reference tier plays in kupix/hevcasm
// (the golden model every optimised tier is compared against,
// /root/reference/src/lib/hevcasm_test.c:96-104).  The transform/filter
// tables are the normative HEVC matrices typed literally; the SATD
// butterfly and quantizer are hevcasm-specific semantics transcribed from
// hadamard.c:45-111 / quantize.c:160-186 (cited at each function), so this
// file is an independent *implementation* of the same contracts, serving
// as a bit-exactness check on the JAX/Pallas tiers.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// All 2-D buffers are contiguous row-major with explicit strides in
// elements.

#include <cstdint>
#include <cstring>
#include <cstdlib>

extern "C" {

static inline int clip3(int lo, int hi, int v) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// --- SAD / SSD -------------------------------------------------------------

int32_t hevcref_sad(const uint8_t* src, int stride_src, const uint8_t* ref,
                    int stride_ref, int w, int h) {
  int32_t s = 0;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      s += std::abs(int(src[y * stride_src + x]) - int(ref[y * stride_ref + x]));
  return s;
}

void hevcref_sad_multiref(const uint8_t* src, int stride_src,
                          const uint8_t* const* refs, int stride_ref, int ways,
                          int w, int h, int32_t* out) {
  for (int k = 0; k < ways; ++k)
    out[k] = hevcref_sad(src, stride_src, refs[k], stride_ref, w, h);
}

// Full-grid SAD: window is (h + num_dy - 1) x (w + num_dx - 1).
void hevcref_sad_grid(const uint8_t* src, const uint8_t* win, int w, int h,
                      int num_dy, int num_dx, int32_t* out) {
  const int ww = w + num_dx - 1;
  for (int dy = 0; dy < num_dy; ++dy)
    for (int dx = 0; dx < num_dx; ++dx)
      out[dy * num_dx + dx] =
          hevcref_sad(src, w, win + dy * ww + dx, ww, w, h);
}

int64_t hevcref_ssd(const uint8_t* a, int stride_a, const uint8_t* b,
                    int stride_b, int w, int h) {
  int64_t s = 0;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const int d = int(a[y * stride_a + x]) - int(b[y * stride_b + x]);
      s += int64_t(d) * d;
    }
  return s;
}

void hevcref_ssd_grid(const uint8_t* src, const uint8_t* win, int w, int h,
                      int num_dy, int num_dx, int32_t* out) {
  const int ww = w + num_dx - 1;
  for (int dy = 0; dy < num_dy; ++dy)
    for (int dx = 0; dx < num_dx; ++dx)
      out[dy * num_dx + dx] =
          (int32_t)hevcref_ssd(src, w, win + dy * ww + dx, ww, w, h);
}

// --- Hadamard SATD (2x2 / 4x4 / 8x8) --------------------------------------
// Recursive butterfly over the difference block, rounding (s + n/4)/(n/2),
// matching hevcasm's compute_satd (hadamard.c:75-111).

static void hadamard_pass(int m, int n, int* dst, const int* src, int stride) {
  for (int i = 0; i < m; i += 2 * n)
    for (int j = 0; j < n; ++j) {
      const int a = src[(i + j) * stride];
      const int b = src[(i + n + j) * stride];
      dst[i + j] = a + b;
      dst[i + n + j] = a - b;
    }
}

static void hadamard_full(int m, int* dst, const int* src, int stride) {
  int tmp[2][8];
  int n = m / 2;
  hadamard_pass(m, n, tmp[0], src, stride);
  int cur = 0;
  while (n > 1) {
    n /= 2;
    hadamard_pass(m, n, tmp[1 - cur], tmp[cur], 1);
    cur = 1 - cur;
  }
  std::memcpy(dst, tmp[cur], m * sizeof(int));
}

int32_t hevcref_satd(const uint8_t* a, int stride_a, const uint8_t* b,
                     int stride_b, int n) {
  int inter[8][8];
  for (int y = 0; y < n; ++y) {
    int diff[8];
    for (int x = 0; x < n; ++x)
      diff[x] = int(a[y * stride_a + x]) - int(b[y * stride_b + x]);
    if (n == 1) { inter[y][0] = diff[0]; continue; }
    hadamard_full(n, inter[y], diff, 1);
  }
  int s = n / 4;
  for (int x = 0; x < n; ++x) {
    int col[8], t[8];
    for (int y = 0; y < n; ++y) col[y] = inter[y][x];
    hadamard_full(n, t, col, 1);
    for (int y = 0; y < n; ++y) s += std::abs(t[y]);
  }
  return s / (n / 2);
}

// --- Quantization ----------------------------------------------------------

int32_t hevcref_quantize(int16_t* dst, const int16_t* src, int scale,
                         int shift, int offset, int n) {
  const int off = offset << (shift - 16);
  int cbf = 0;
  for (int i = 0; i < n; ++i) {
    int x = src[i];
    const int sign = x < 0 ? -1 : 1;
    x = std::abs(x);
    x = int((int64_t(x) * scale + off) >> shift) * sign;
    x = clip3(-32768, 32767, x);
    cbf |= x;
    dst[i] = (int16_t)x;
  }
  return cbf;
}

void hevcref_quantize_inverse(int16_t* dst, const int16_t* src, int scale,
                              int shift, int n) {
  for (int i = 0; i < n; ++i) {
    const int v = int((int64_t(src[i]) * scale + (1 << (shift - 1))) >> shift);
    dst[i] = (int16_t)clip3(-32768, 32767, v);
  }
}

void hevcref_reconstruct(uint8_t* rec, int stride_rec, const uint8_t* pred,
                         int stride_pred, const int16_t* res, int n) {
  for (int y = 0; y < n; ++y)
    for (int x = 0; x < n; ++x)
      rec[y * stride_rec + x] =
          (uint8_t)clip3(0, 255, int(pred[y * stride_pred + x]) + res[y * n + x]);
}

// --- Transforms ------------------------------------------------------------
// Normative 32-point HEVC transform matrix (ITU-T H.265 section 8.6.4),
// typed literally; the 16/8/4-point matrices are its even-row subsets.

static const int16_t T32[32][32] = {
  {64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64,64},
  {90,90,88,85,82,78,73,67,61,54,46,38,31,22,13,4,-4,-13,-22,-31,-38,-46,-54,-61,-67,-73,-78,-82,-85,-88,-90,-90},
  {90,87,80,70,57,43,25,9,-9,-25,-43,-57,-70,-80,-87,-90,-90,-87,-80,-70,-57,-43,-25,-9,9,25,43,57,70,80,87,90},
  {90,82,67,46,22,-4,-31,-54,-73,-85,-90,-88,-78,-61,-38,-13,13,38,61,78,88,90,85,73,54,31,4,-22,-46,-67,-82,-90},
  {89,75,50,18,-18,-50,-75,-89,-89,-75,-50,-18,18,50,75,89,89,75,50,18,-18,-50,-75,-89,-89,-75,-50,-18,18,50,75,89},
  {88,67,31,-13,-54,-82,-90,-78,-46,-4,38,73,90,85,61,22,-22,-61,-85,-90,-73,-38,4,46,78,90,82,54,13,-31,-67,-88},
  {87,57,9,-43,-80,-90,-70,-25,25,70,90,80,43,-9,-57,-87,-87,-57,-9,43,80,90,70,25,-25,-70,-90,-80,-43,9,57,87},
  {85,46,-13,-67,-90,-73,-22,38,82,88,54,-4,-61,-90,-78,-31,31,78,90,61,4,-54,-88,-82,-38,22,73,90,67,13,-46,-85},
  {83,36,-36,-83,-83,-36,36,83,83,36,-36,-83,-83,-36,36,83,83,36,-36,-83,-83,-36,36,83,83,36,-36,-83,-83,-36,36,83},
  {82,22,-54,-90,-61,13,78,85,31,-46,-90,-67,4,73,88,38,-38,-88,-73,-4,67,90,46,-31,-85,-78,-13,61,90,54,-22,-82},
  {80,9,-70,-87,-25,57,90,43,-43,-90,-57,25,87,70,-9,-80,-80,-9,70,87,25,-57,-90,-43,43,90,57,-25,-87,-70,9,80},
  {78,-4,-82,-73,13,85,67,-22,-88,-61,31,90,54,-38,-90,-46,46,90,38,-54,-90,-31,61,88,22,-67,-85,-13,73,82,4,-78},
  {75,-18,-89,-50,50,89,18,-75,-75,18,89,50,-50,-89,-18,75,75,-18,-89,-50,50,89,18,-75,-75,18,89,50,-50,-89,-18,75},
  {73,-31,-90,-22,78,67,-38,-90,-13,82,61,-46,-88,-4,85,54,-54,-85,4,88,46,-61,-82,13,90,38,-67,-78,22,90,31,-73},
  {70,-43,-87,9,90,25,-80,-57,57,80,-25,-90,-9,87,43,-70,-70,43,87,-9,-90,-25,80,57,-57,-80,25,90,9,-87,-43,70},
  {67,-54,-78,38,85,-22,-90,4,90,13,-88,-31,82,46,-73,-61,61,73,-46,-82,31,88,-13,-90,-4,90,22,-85,-38,78,54,-67},
  {64,-64,-64,64,64,-64,-64,64,64,-64,-64,64,64,-64,-64,64,64,-64,-64,64,64,-64,-64,64,64,-64,-64,64,64,-64,-64,64},
  {61,-73,-46,82,31,-88,-13,90,-4,-90,22,85,-38,-78,54,67,-67,-54,78,38,-85,-22,90,4,-90,13,88,-31,-82,46,73,-61},
  {57,-80,-25,90,-9,-87,43,70,-70,-43,87,9,-90,25,80,-57,-57,80,25,-90,9,87,-43,-70,70,43,-87,-9,90,-25,-80,57},
  {54,-85,-4,88,-46,-61,82,13,-90,38,67,-78,-22,90,-31,-73,73,31,-90,22,78,-67,-38,90,-13,-82,61,46,-88,4,85,-54},
  {50,-89,18,75,-75,-18,89,-50,-50,89,-18,-75,75,18,-89,50,50,-89,18,75,-75,-18,89,-50,-50,89,-18,-75,75,18,-89,50},
  {46,-90,38,54,-90,31,61,-88,22,67,-85,13,73,-82,4,78,-78,-4,82,-73,-13,85,-67,-22,88,-61,-31,90,-54,-38,90,-46},
  {43,-90,57,25,-87,70,9,-80,80,-9,-70,87,-25,-57,90,-43,-43,90,-57,-25,87,-70,-9,80,-80,9,70,-87,25,57,-90,43},
  {38,-88,73,-4,-67,90,-46,-31,85,-78,13,61,-90,54,22,-82,82,-22,-54,90,-61,-13,78,-85,31,46,-90,67,4,-73,88,-38},
  {36,-83,83,-36,-36,83,-83,36,36,-83,83,-36,-36,83,-83,36,36,-83,83,-36,-36,83,-83,36,36,-83,83,-36,-36,83,-83,36},
  {31,-78,90,-61,4,54,-88,82,-38,-22,73,-90,67,-13,-46,85,-85,46,13,-67,90,-73,22,38,-82,88,-54,-4,61,-90,78,-31},
  {25,-70,90,-80,43,9,-57,87,-87,57,-9,-43,80,-90,70,-25,-25,70,-90,80,-43,-9,57,-87,87,-57,9,43,-80,90,-70,25},
  {22,-61,85,-90,73,-38,-4,46,-78,90,-82,54,-13,-31,67,-88,88,-67,31,13,-54,82,-90,78,-46,4,38,-73,90,-85,61,-22},
  {18,-50,75,-89,89,-75,50,-18,-18,50,-75,89,-89,75,-50,18,18,-50,75,-89,89,-75,50,-18,-18,50,-75,89,-89,75,-50,18},
  {13,-38,61,-78,88,-90,85,-73,54,-31,4,22,-46,67,-82,90,-90,82,-67,46,-22,-4,31,-54,73,-85,90,-88,78,-61,38,-13},
  {9,-25,43,-57,70,-80,87,-90,90,-87,80,-70,57,-43,25,-9,-9,25,-43,57,-70,80,-87,90,-90,87,-80,70,-57,43,-25,9},
  {4,-13,22,-31,38,-46,54,-61,67,-73,78,-82,85,-88,90,-90,90,-90,88,-85,82,-78,73,-67,61,-54,46,-38,31,-22,13,-4},
};

static const int16_t DST4[4][4] = {
  {29, 55, 74, 84}, {74, 74, 0, -74}, {84, -29, -74, 55}, {55, -84, 74, -29}};

// t(k, j) for the n-point matrix (n in {4, 8, 16, 32}; tr_type 1 = DST4).
static inline int tmat(int tr_type, int n, int k, int j) {
  if (tr_type) return DST4[k][j];
  return T32[k * (32 / n)][j];
}

// Forward pass: dst[k*n+i] = (sum_j T[k][j]*src[i*n+j] + add) >> shift,
// stored into int16 (wraps).
static void fwd_pass(int16_t* dst, const int16_t* src, int n, int tr_type,
                     int shift) {
  const int add = 1 << (shift - 1);
  for (int k = 0; k < n; ++k)
    for (int i = 0; i < n; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < n; ++j)
        acc += int64_t(tmat(tr_type, n, k, j)) * src[i * n + j];
      dst[k * n + i] = (int16_t)((acc + add) >> shift);
    }
}

// Inverse pass: dst[i*n+k] = clip3((sum_j T[j][k]*src[j*n+i] + add) >> shift).
static void inv_pass(int16_t* dst, const int16_t* src, int n, int tr_type,
                     int shift) {
  const int add = 1 << (shift - 1);
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < n; ++k) {
      int64_t acc = 0;
      for (int j = 0; j < n; ++j)
        acc += int64_t(tmat(tr_type, n, j, k)) * src[j * n + i];
      dst[i * n + k] = (int16_t)clip3(-32768, 32767, int((acc + add) >> shift));
    }
}

void hevcref_forward_transform(int16_t* coeffs, const int16_t* res, int n,
                               int tr_type) {
  int16_t tmp[32 * 32];
  int log2 = 0;
  while ((1 << log2) < n) ++log2;
  fwd_pass(tmp, res, n, tr_type, log2 - 1);
  fwd_pass(coeffs, tmp, n, tr_type, log2 + 6);
}

void hevcref_inverse_transform_add(uint8_t* rec, const int16_t* coeffs,
                                   const uint8_t* pred, int n, int tr_type) {
  int16_t t1[32 * 32], t2[32 * 32];
  inv_pass(t1, coeffs, n, tr_type, 7);
  inv_pass(t2, t1, n, tr_type, 12);
  for (int y = 0; y < n; ++y)
    for (int x = 0; x < n; ++x)
      rec[y * n + x] = (uint8_t)clip3(0, 255, int(pred[y * n + x]) + t2[y * n + x]);
}

// --- Inter prediction ------------------------------------------------------
// HEVC MC filters (spec tables 8-11/8-12; identical values at
// pred_inter.c:57-79).

static const int KERN8[4][8] = {
  {0, 0, 0, 64, 0, 0, 0, 0},
  {-1, 4, -10, 58, 17, -5, 1, 0},
  {-1, 4, -11, 40, 40, -11, 4, -1},
  {0, 1, -5, 17, 58, -10, 4, -1}};
static const int KERN4[8][4] = {
  {0, 64, 0, 0},  {-2, 58, 10, -2}, {-4, 54, 16, -2}, {-6, 46, 28, -4},
  {-4, 36, 36, -4}, {-4, 28, 46, -6}, {-2, 16, 54, -4}, {-2, 10, 58, -2}};

// Uni prediction on an extended window (h+taps-1, w+taps-1) whose
// integer-pel origin is at (pad, pad), pad = taps/2 - 1.  Matches the
// unified H->V path (bit-exact with all four reference cases).
void hevcref_pred_uni(uint8_t* dst, const uint8_t* win, int w, int h,
                      int xfrac, int yfrac, int taps) {
  const int ww = w + taps - 1;
  const int hh = h + taps - 1;
  int16_t inter[71 * 64];  // max (64+7) x 64
  for (int y = 0; y < hh; ++y)
    for (int x = 0; x < w; ++x) {
      int a = 0;
      for (int k = 0; k < taps; ++k) {
        const int c = taps == 8 ? KERN8[xfrac][k] : KERN4[xfrac][k];
        a += c * win[y * ww + x + k];
      }
      inter[y * w + x] = (int16_t)a;
    }
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int a = 2048;
      for (int k = 0; k < taps; ++k) {
        const int c = taps == 8 ? KERN8[yfrac][k] : KERN4[yfrac][k];
        a += c * inter[(y + k) * w + x];
      }
      dst[y * w + x] = (uint8_t)clip3(0, 255, a >> 12);
    }
}

void hevcref_pred_bi(uint8_t* dst, const uint8_t* win0, const uint8_t* win1,
                     int w, int h, int fx0, int fy0, int fx1, int fy1,
                     int taps) {
  const int ww = w + taps - 1;
  const int hh = h + taps - 1;
  int16_t r[2][64 * 64];
  const uint8_t* wins[2] = {win0, win1};
  const int fx[2] = {fx0, fx1}, fy[2] = {fy0, fy1};
  for (int p = 0; p < 2; ++p) {
    int16_t inter[71 * 64];
    for (int y = 0; y < hh; ++y)
      for (int x = 0; x < w; ++x) {
        int a = 0;
        for (int k = 0; k < taps; ++k) {
          const int c = taps == 8 ? KERN8[fx[p]][k] : KERN4[fx[p]][k];
          a += c * wins[p][y * ww + x + k];
        }
        inter[y * w + x] = (int16_t)a;
      }
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        int a = 0;
        for (int k = 0; k < taps; ++k) {
          const int c = taps == 8 ? KERN8[fy[p]][k] : KERN4[fy[p]][k];
          a += c * inter[(y + k) * w + x];
        }
        r[p][y * w + x] = (int16_t)(a >> 6);
      }
  }
  for (int i = 0; i < w * h; ++i)
    dst[i] = (uint8_t)clip3(0, 255, (int(r[0][i]) + r[1][i] + 64) >> 7);
}

// --- Intra prediction (DC; bit-exact with pred_intra.c:66-103) -------------

void hevcref_pred_intra_dc(uint8_t* dst, const uint8_t* left,
                           const uint8_t* above, int n, int filter_edge) {
  int k = 0;
  while ((1 << k) < n) ++k;
  int dc = n;
  for (int i = 0; i < n; ++i) dc += above[i] + left[i];
  dc >>= k + 1;
  for (int i = 0; i < n * n; ++i) dst[i] = (uint8_t)dc;
  if (filter_edge) {
    dst[0] = (uint8_t)((left[0] + 2 * dc + above[0] + 2) >> 2);
    for (int x = 1; x < n; ++x) dst[x] = (uint8_t)((above[x] + 3 * dc + 2) >> 2);
    for (int y = 1; y < n; ++y)
      dst[y * n] = (uint8_t)((left[y] + 3 * dc + 2) >> 2);
  }
}

}  // extern "C"
