// Native text formatter for the legacy-VTK ASCII writer.
//
// TPU-native equivalent of the reference's C++ I/O layer (VTKWriter,
// cavity-01.cpp:95-300): the device computes, the host formats. At the
// 2048^2 benchmark scale a snapshot is ~30M formatted values; Python-side
// numpy string formatting is 10-50x slower than this tight snprintf loop,
// and snprintf guarantees byte parity with the C++ iostream fixed<<6 output
// the golden files were produced with.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).

#include <cstdio>
#include <cstring>

extern "C" {

// Format n doubles as "%.6f\n" lines into out (caller allocates >= n*40
// bytes). Where literal_mask[i] != 0 the reference streams the bare
// literal "0.0" instead (backwards_step-01.cpp:160,196,220,233). Returns
// bytes written.
long fmt_scalar_fixed6(const double* x, long n, const unsigned char* literal_mask,
                       char* out) {
    char* w = out;
    for (long i = 0; i < n; ++i) {
        if (literal_mask && literal_mask[i]) {
            std::memcpy(w, "0.0\n", 4);
            w += 4;
        } else {
            w += std::snprintf(w, 40, "%.6f\n", x[i]);
        }
    }
    return (long)(w - out);
}

// Vector rows "u v 0.0\n"; masked rows are the literal "0.0 0.0 0.0\n"
// (backwards_step-01.cpp:160-163).
long fmt_vector_fixed6(const double* u, const double* v, long n,
                       const unsigned char* literal_mask, char* out) {
    char* w = out;
    for (long i = 0; i < n; ++i) {
        if (literal_mask && literal_mask[i]) {
            std::memcpy(w, "0.0 0.0 0.0\n", 12);
            w += 12;
        } else {
            w += std::snprintf(w, 84, "%.6f %.6f 0.0\n", u[i], v[i]);
        }
    }
    return (long)(w - out);
}

}  // extern "C"
