// Reference-equivalent CPU baseline for bench.py.
//
// The upstream C++ simulator cannot be compiled in this environment (its
// micromd submodule is not vendored; SURVEY.md §2.9), so this standalone
// single-threaded program re-implements the same interphase hot loop the
// reference runs — cell-list neighbor search, A/B-mixed softcore pair
// forces, chain bonds, ellipsoid wall, Brownian-dynamics update, and the
// every-20-steps hash-map contact counting — with the reference's compile
// flags (-O2 -march=native -funsafe-math-optimizations, single thread).
// It reports steady-state bead-steps/s as JSON on stdout.
//
// Usage: bench_baseline N_BEADS N_STEPS

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <unordered_map>
#include <vector>

struct Vec { double x, y, z; };

int main(int argc, char** argv) {
    const int n = argc > 1 ? std::atoi(argv[1]) : 100000;
    const int steps = argc > 2 ? std::atoi(argv[2]) : 20;
    const double ball_radius = argc > 3 ? std::atof(argv[3]) : 2.5;

    // Interphase defaults (simulation_config.hpp:61-115 semantics).
    const double dt = 1e-5, temperature = 1.0;
    const double core_scale = 0.5;                 // early-G1 (fewest pairs)
    const double a_diam = 0.30 * core_scale, b_diam = 0.24 * core_scale;
    const double a_rep = 2.5, b_rep = 2.5;
    const double a_bondk = 100.0, b_bondk = 50.0;
    const double contact_dist = 0.24 * core_scale;
    // Wall semiaxis matches the start ball so the measured density stays at
    // the stated value instead of compressing during the run (the JAX bench
    // uses the same geometry).
    const double wall_ax = ball_radius;
    const double wall_pack = 1000.0;
    const double cutoff = a_diam;                  // max diameter * scale
    const int contact_every = 20;

    std::mt19937_64 rng(12345);
    std::normal_distribution<double> normal;
    std::uniform_real_distribution<double> uni(-1.0, 1.0);

    std::vector<Vec> x(n), f(n);
    std::vector<double> af(n), bf(n);
    for (int i = 0; i < n; i++) {
        // Random ball (same density as bench.py).
        double px, py, pz;
        do { px = uni(rng); py = uni(rng); pz = uni(rng); }
        while (px * px + py * py + pz * pz > 1.0);
        x[i] = {ball_radius * px, ball_radius * py, ball_radius * pz};
        af[i] = (i % 2 == 0) ? 1.0 : 0.0;
        bf[i] = 1.0 - af[i];
    }
    const int chains = 46;
    const int chain_len = n / chains;

    // Cell grid sized to the cutoff.
    const double bound = 4.0;
    const double h = cutoff;
    const int dims = int(std::ceil(2 * bound / h));
    const int ncells = dims * dims * dims;
    std::vector<int> head(ncells), next(n);
    std::unordered_map<std::uint64_t, std::uint32_t> contacts;

    auto cell_of = [&](const Vec& p) {
        int cx = std::min(std::max(int((p.x + bound) / h), 0), dims - 1);
        int cy = std::min(std::max(int((p.y + bound) / h), 0), dims - 1);
        int cz = std::min(std::max(int((p.z + bound) / h), 0), dims - 1);
        return (cx * dims + cy) * dims + cz;
    };

    const double noise_amp = std::sqrt(2.0 * temperature * dt);
    const double cut2 = cutoff * cutoff;
    const double cdist2 = contact_dist * contact_dist;

    auto t0 = std::chrono::steady_clock::now();
    for (int step = 1; step <= steps; step++) {
        // Rebuild cell list.
        std::fill(head.begin(), head.end(), -1);
        for (int i = 0; i < n; i++) {
            int c = cell_of(x[i]);
            next[i] = head[c];
            head[c] = i;
        }
        for (int i = 0; i < n; i++) f[i] = {0, 0, 0};

        const bool with_contacts = (step % contact_every) == 0;

        // Pairwise softcore over half the neighbor shell.
        for (int cx = 0; cx < dims; cx++)
        for (int cy = 0; cy < dims; cy++)
        for (int cz = 0; cz < dims; cz++) {
            int c = (cx * dims + cy) * dims + cz;
            for (int i = head[c]; i >= 0; i = next[i]) {
                for (int dcx = -1; dcx <= 1; dcx++)
                for (int dcy = -1; dcy <= 1; dcy++)
                for (int dcz = -1; dcz <= 1; dcz++) {
                    int nx_ = cx + dcx, ny_ = cy + dcy, nz_ = cz + dcz;
                    if (nx_ < 0 || ny_ < 0 || nz_ < 0 ||
                        nx_ >= dims || ny_ >= dims || nz_ >= dims) continue;
                    int nc = (nx_ * dims + ny_) * dims + nz_;
                    for (int j = head[nc]; j >= 0; j = next[j]) {
                        if (j <= i) continue;
                        double dx = x[i].x - x[j].x;
                        double dy = x[i].y - x[j].y;
                        double dz = x[i].z - x[j].z;
                        double r2 = dx * dx + dy * dy + dz * dz;
                        if (r2 >= cut2) continue;
                        double am = 0.5 * (af[i] + af[j]);
                        double bm = 0.5 * (bf[i] + bf[j]);
                        // softcore<2,3>: c = e*n*p/d^2 * (1-s)^2, s=r2/d^2
                        double coef = 0.0;
                        {
                            double s = r2 / (a_diam * a_diam);
                            if (s < 1.0) {
                                double core = 1.0 - s;
                                coef += am * a_rep * 6.0 / (a_diam * a_diam)
                                        * core * core;
                            }
                        }
                        {
                            double s = r2 / (b_diam * b_diam);
                            if (s < 1.0) {
                                double s4 = s * s * s * s;
                                double core = 1.0 - s4;
                                coef += bm * b_rep * 24.0 / (b_diam * b_diam)
                                        * s * s * s * core * core;
                            }
                        }
                        f[i].x += coef * dx; f[i].y += coef * dy; f[i].z += coef * dz;
                        f[j].x -= coef * dx; f[j].y -= coef * dy; f[j].z -= coef * dz;
                        if (with_contacts && r2 < cdist2) {
                            contacts[(std::uint64_t(i) << 32) | std::uint64_t(j)]++;
                        }
                    }
                }
            }
        }

        // Chain bonds (mixed spring, b = 0).
        for (int ch = 0; ch < chains; ch++) {
            int s0 = ch * chain_len, s1 = s0 + chain_len;
            for (int i = s0; i + 1 < s1; i++) {
                int j = i + 1;
                double am = 0.5 * (af[i] + af[j]);
                double bm = 0.5 * (bf[i] + bf[j]);
                double k = (am * a_bondk + bm * b_bondk) / (core_scale * core_scale);
                double dx = x[i].x - x[j].x;
                double dy = x[i].y - x[j].y;
                double dz = x[i].z - x[j].z;
                f[i].x -= k * dx; f[i].y -= k * dy; f[i].z -= k * dz;
                f[j].x += k * dx; f[j].y += k * dy; f[j].z += k * dz;
            }
        }

        // Ellipsoid wall (spherical here): inward half-diameter softcore,
        // outward harmonic.
        for (int i = 0; i < n; i++) {
            double r2 = x[i].x * x[i].x + x[i].y * x[i].y + x[i].z * x[i].z;
            double r = std::sqrt(r2) + 1e-12;
            double d = wall_ax - r;  // signed distance, > 0 inside
            if (d > 0) {
                double dd = d * d;
                double coef = 0.0;
                double wa = 0.5 * (af[i] + 0.0), wb = 0.5 * (bf[i] + 10.0);
                double had = a_diam / 2, hbd = b_diam / 2;
                double s = dd / (had * had);
                if (s < 1.0) { double core = 1 - s; coef += wa * a_rep * 6.0 / (had * had) * core * core; }
                double sb = dd / (hbd * hbd);
                if (sb < 1.0) { double s4 = sb * sb * sb * sb; double core = 1 - s4;
                                coef += wb * b_rep * 24.0 / (hbd * hbd) * sb * sb * sb * core * core; }
                // force points inward (negative radial)
                double fr = -coef * d;
                f[i].x += fr * x[i].x / r; f[i].y += fr * x[i].y / r; f[i].z += fr * x[i].z / r;
            } else {
                double fr = wall_pack * d;  // pull back in
                f[i].x += fr * x[i].x / r; f[i].y += fr * x[i].y / r; f[i].z += fr * x[i].z / r;
            }
        }

        // BD update (mobility 1).
        for (int i = 0; i < n; i++) {
            x[i].x += f[i].x * dt + noise_amp * normal(rng);
            x[i].y += f[i].y * dt + noise_amp * normal(rng);
            x[i].z += f[i].z * dt + noise_amp * normal(rng);
        }
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    double bead_steps = double(n) * steps / secs;
    std::printf(
        "{\"bead_steps_per_s\": %.1f, \"steps_per_s\": %.3f, \"contacts\": %zu}\n",
        bead_steps, steps / secs, contacts.size());
    return 0;
}
