// Native host runtime kernels for smol_tpu.
//
// The TPU owns all MC/correlation compute; these C++ kernels accelerate the
// host-side setup paths that the reference implements natively as well
// (Cython/OpenMP): periodic-boundary coordinate matching used by supercell
// orbit-index generation (the O(clusters x sites) hot spot of
// ClusterSubspace.get_orbit_indices), and real-space Ewald matrix assembly.
//
// Built as a plain shared library; accessed from Python via ctypes
// (smol_tpu/utils/native.py) with a numpy fallback when unavailable.

#include <cmath>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Map each fractional coordinate row of `sub` [n_sub, 3] to the index of its
// unique match (modulo 1) in `sup` [n_sup, 3].  Writes -1 when no match and
// -2 when multiple matches.  Returns 0 on success, the number of failed rows
// otherwise.
int64_t coord_list_mapping_pbc(const double* sub, int64_t n_sub,
                               const double* sup, int64_t n_sup,
                               double atol, int64_t* out) {
    int64_t failures = 0;
#pragma omp parallel for reduction(+ : failures) schedule(static)
    for (int64_t i = 0; i < n_sub; ++i) {
        const double a0 = sub[3 * i + 0];
        const double a1 = sub[3 * i + 1];
        const double a2 = sub[3 * i + 2];
        int64_t found = -1;
        for (int64_t j = 0; j < n_sup; ++j) {
            double d0 = a0 - sup[3 * j + 0];
            double d1 = a1 - sup[3 * j + 1];
            double d2 = a2 - sup[3 * j + 2];
            d0 -= std::nearbyint(d0);
            d1 -= std::nearbyint(d1);
            d2 -= std::nearbyint(d2);
            if (std::fabs(d0) < atol && std::fabs(d1) < atol &&
                std::fabs(d2) < atol) {
                if (found >= 0) {
                    found = -2;
                    break;
                }
                found = j;
            }
        }
        out[i] = found;
        if (found < 0) ++failures;
    }
    return failures;
}

// Real-space Ewald pair sums: for sites i, j (cartesian coords [n, 3]) and
// periodic images `img_cart` [m, 3], accumulate
//   real[i, j] = sum_images erfc(sqrt_eta * r) / r   for 0 < r <= rmax
// excluding the zero-distance self term.  Symmetric output [n, n].
void ewald_real_sums(const double* coords, int64_t n,
                     const double* img_cart, int64_t m,
                     double sqrt_eta, double rmax, double* out) {
    const double rmax2 = rmax * rmax;
#pragma omp parallel for schedule(dynamic, 4)
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t j = i; j < n; ++j) {
            const double bx = coords[3 * i + 0] - coords[3 * j + 0];
            const double by = coords[3 * i + 1] - coords[3 * j + 1];
            const double bz = coords[3 * i + 2] - coords[3 * j + 2];
            double acc = 0.0;
            for (int64_t k = 0; k < m; ++k) {
                const double dx = bx - img_cart[3 * k + 0];
                const double dy = by - img_cart[3 * k + 1];
                const double dz = bz - img_cart[3 * k + 2];
                const double r2 = dx * dx + dy * dy + dz * dz;
                if (r2 > rmax2 || r2 < 1e-24) continue;
                const double r = std::sqrt(r2);
                acc += std::erfc(sqrt_eta * r) / r;
            }
            out[i * n + j] = acc;
            out[j * n + i] = acc;
        }
    }
}

// Host OpenMP thread-count control (reference smol/utils/_openmp_helpers.pyx):
// smol_tpu device kernels are unaffected; these knobs govern only the
// OpenMP loops in this library.
int64_t smol_get_max_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

void smol_set_num_threads(int64_t n) {
#ifdef _OPENMP
    if (n > 0) omp_set_num_threads((int)n);
#else
    (void)n;
#endif
}

}  // extern "C"

