// Surrogate-reference G1 integrator for quantitative correctness testing.
//
// The upstream reference binaries cannot be built in this environment (the
// micromd submodule is not vendored; SURVEY.md §2.9), so this standalone
// single-threaded C++ program re-implements the complete interphase G1 step
// with the reference's semantics and default parameters
// (simulation_config.hpp:61-115): A/B-mixed softcore pair forces over a cell
// list, mixed semispring chain bonds with the fluctuation-preserving
// bond-scale rescale, the ellipsoidal wall (inward mixed half-diameter
// softcore / outward harmonic recapture) with per-axis reaction, the
// scheduled core/bond expansion, the wall-inflation ODE, and the
// every-20-steps hash-map contact map (contact_map.cpp:33-85).
//
// tests/test_correlation.py integrates the same system with the JAX engine
// (different RNG, same physics) and gates contact-map Pearson r >= 0.95 plus
// bond-variance / radius-of-gyration equivalence.
//
// Usage:
//   surrogate_ref init.txt N chains steps burnin seed out_contacts.tsv
// init.txt: N lines "x y z".  stdout: one JSON line of summary stats.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <unordered_map>
#include <vector>

struct Vec { double x, y, z; };

// softcore<2,3> force coefficient: c with F = c * dx.
static inline double c_soft23(double r2, double e, double inv_d2) {
    double s = r2 * inv_d2;
    double core = 1.0 - s;
    return core > 0 ? 6.0 * e * inv_d2 * core * core : 0.0;
}
// softcore<8,3> force coefficient.
static inline double c_soft83(double r2, double e, double inv_d2) {
    double s = r2 * inv_d2;
    double s2 = s * s;
    double core = 1.0 - s2 * s2;
    return core > 0 ? 24.0 * e * inv_d2 * s * s2 * core * core : 0.0;
}

int main(int argc, char** argv) {
    if (argc < 8) {
        std::fprintf(stderr,
            "usage: surrogate_ref init.txt N chains steps burnin seed out.tsv"
            " [n_nor_sites]\n");
        return 2;
    }
    const char* init_path = argv[1];
    const int n = std::atoi(argv[2]);
    const int chains = std::atoi(argv[3]);
    const int steps = std::atoi(argv[4]);
    const int burnin = std::atoi(argv[5]);
    const unsigned seed = unsigned(std::strtoul(argv[6], nullptr, 10));
    const char* out_path = argv[7];
    // Nucleolus mode: the LAST 2*n_nor_sites beads of the init file are
    // nucleolar particles (nucleolus_bead_count = 2 per active NOR,
    // simulation_config.hpp defaults); NOR site t is chain bead
    // (t+1)*chain_beads/(n_sites+1), matching the JAX-side test design.
    const int n_sites = argc > 8 ? std::atoi(argv[8]) : 0;
    const int nuc_per_site = 2;
    const int n_nuc = n_sites * nuc_per_site;
    const int n_chainbeads = n - n_nuc;

    // Reference interphase defaults (simulation_config.hpp:61-115).
    const double dt = 1e-5, temperature = 1.0;
    const double a_diam = 0.30, b_diam = 0.24;
    const double a_rep = 2.5, b_rep = 2.5;
    const double a_bondk = 100.0, b_bondk = 50.0;
    const double contact_dist0 = 0.24;
    const int contact_every = 20;
    const double scale_init = 0.5, scale_tau = 0.5;
    double semiaxes[3] = {2.0, 2.0, 2.0};
    const double wall_spring = 3e4, wall_pack = 1000.0, wall_mob = 2e-4;
    const double wall_fa = 0.0, wall_fb = 10.0;

    std::vector<Vec> x(n), f(n);
    std::vector<double> af(n), bf(n);
    {
        std::FILE* fp = std::fopen(init_path, "r");
        if (!fp) { std::fprintf(stderr, "cannot open %s\n", init_path); return 2; }
        for (int i = 0; i < n; i++) {
            if (std::fscanf(fp, "%lf %lf %lf", &x[i].x, &x[i].y, &x[i].z) != 3) {
                std::fprintf(stderr, "short init file\n"); return 2;
            }
            if (i < n_chainbeads) {
                af[i] = (i % 2 == 0) ? 1.0 : 0.0;  // matches the JAX model
                bf[i] = 1.0 - af[i];
            } else {
                af[i] = 0.0;   // nucleolus_ab_factor (0, 10)
                bf[i] = 10.0;
            }
        }
        std::fclose(fp);
    }
    const int chain_len = n_chainbeads / chains;
    // NOR-nucleolus bonds (nor chain bead, nucleolar bead).
    std::vector<int> nor_of(n_nuc);
    for (int t = 0; t < n_sites; t++) {
        int site = (t + 1) * n_chainbeads / (n_sites + 1);
        for (int u = 0; u < nuc_per_site; u++)
            nor_of[t * nuc_per_site + u] = site;
    }
    const double nuc_bondk = 10.0;   // nucleolus_bond_spring, l = 0
    const double drop_e = 0.3, drop_decay = 0.2, drop_cut = 0.4;

    std::mt19937_64 rng(seed);
    std::normal_distribution<double> normal;
    const double noise_amp = std::sqrt(2.0 * temperature * dt);

    // Cell grid sized for the largest (core_scale -> 1) cutoff.
    const double bound = 4.0, h = a_diam;
    const int dims = int(std::ceil(2 * bound / h));
    const int ncells = dims * dims * dims;
    std::vector<int> head(ncells), next(n);
    auto cell_of = [&](const Vec& p) {
        int cx = std::min(std::max(int((p.x + bound) / h), 0), dims - 1);
        int cy = std::min(std::max(int((p.y + bound) / h), 0), dims - 1);
        int cz = std::min(std::max(int((p.z + bound) / h), 0), dims - 1);
        return (cx * dims + cy) * dims + cz;
    };

    std::unordered_map<std::uint64_t, std::uint32_t> contacts;

    auto scale_at = [&](double t) {
        return 1.0 - (1.0 - scale_init) * std::exp(-t / scale_tau);
    };

    for (int step = 1; step <= steps; step++) {
        // Scales lag one callback, like the reference driver
        // (simulation_driver_interphase.cpp:16-63).
        const double core_scale = scale_at((step - 1) * dt);
        const double bond_scale = scale_at((step - 1) * dt);
        const double ia2 = 1.0 / (a_diam * core_scale * a_diam * core_scale);
        const double ib2 = 1.0 / (b_diam * core_scale * b_diam * core_scale);
        const double cutoff = a_diam * core_scale;
        const double cut2 = cutoff * cutoff;

        std::fill(head.begin(), head.end(), -1);
        for (int i = 0; i < n; i++) {
            int c = cell_of(x[i]);
            next[i] = head[c];
            head[c] = i;
        }
        for (int i = 0; i < n; i++) f[i] = {0, 0, 0};

        // Pairwise softcore over the half neighbor shell.
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
                        double coef = am * c_soft23(r2, a_rep, ia2)
                                    + bm * c_soft83(r2, b_rep, ib2);
                        f[i].x += coef * dx; f[i].y += coef * dy; f[i].z += coef * dz;
                        f[j].x -= coef * dx; f[j].y -= coef * dy; f[j].z -= coef * dz;
                    }
                }
            }
        }

        // Chain bonds: K/s^2, l*s (fluctuation-preserving rescale,
        // simulation_driver_forcefield.cpp:78-88); l = 0 by default.
        const double s2b = bond_scale * bond_scale;
        for (int ch = 0; ch < chains; ch++) {
            int s0 = ch * chain_len, s1 = s0 + chain_len;
            for (int i = s0; i + 1 < s1; i++) {
                int j = i + 1;
                double am = 0.5 * (af[i] + af[j]);
                double bm = 0.5 * (bf[i] + bf[j]);
                double k = (am * a_bondk + bm * b_bondk) / s2b;
                double dx = x[i].x - x[j].x;
                double dy = x[i].y - x[j].y;
                double dz = x[i].z - x[j].z;
                f[i].x -= k * dx; f[i].y -= k * dy; f[i].z -= k * dz;
                f[j].x += k * dx; f[j].y += k * dy; f[j].z += k * dz;
            }
        }

        // NOR-nucleolus bonds: semispring with l = 0 (always stretched ->
        // plain spring coefficient), K / bond_scale^2 like every bond
        // (simulation_driver_forcefield.cpp:139-186).
        for (int t = 0; t < n_nuc; t++) {
            int i = nor_of[t], j = n_chainbeads + t;
            double k = nuc_bondk / s2b;
            double dx = x[i].x - x[j].x;
            double dy = x[i].y - x[j].y;
            double dz = x[i].z - x[j].z;
            f[i].x -= k * dx; f[i].y -= k * dy; f[i].z -= k * dz;
            f[j].x += k * dx; f[j].y += k * dy; f[j].z += k * dz;
        }

        // Nucleolar droplet: softwell<6> attraction among nucleolar
        // particles, force truncated at the droplet cutoff (the JAX
        // engine's drop_c in models/interphase.py).
        if (n_nuc > 1) {
            const double inv_dd2 = 1.0 / (drop_decay * drop_decay);
            const double dc2 = drop_cut * drop_cut;
            for (int a = 0; a < n_nuc; a++)
            for (int b2 = a + 1; b2 < n_nuc; b2++) {
                int i = n_chainbeads + a, j = n_chainbeads + b2;
                double dx = x[i].x - x[j].x;
                double dy = x[i].y - x[j].y;
                double dz = x[i].z - x[j].z;
                double r2 = dx * dx + dy * dy + dz * dz;
                if (r2 >= dc2) continue;
                double t3 = r2 * inv_dd2;
                t3 = t3 * t3 * t3;
                double denom = (1.0 + t3) * (1.0 + t3);
                double coef = -drop_e * 6.0 * t3
                            / (std::max(r2, 1e-30) * denom);
                f[i].x += coef * dx; f[i].y += coef * dy; f[i].z += coef * dz;
                f[j].x -= coef * dx; f[j].y -= coef * dy; f[j].z -= coef * dz;
            }
        }

        // Ellipsoid wall: inward mixed half-diameter softcore / outward
        // harmonic, forces and per-axis reaction from the same signed
        // distance d = |x|(1/s - 1) the JAX engine differentiates
        // (ops/wall.py:35-54).
        double reaction[3] = {0, 0, 0};
        const double iha2 = ia2 * 4.0, ihb2 = ib2 * 4.0;  // half diameters
        for (int i = 0; i < n; i++) {
            double xs[3] = {x[i].x, x[i].y, x[i].z};
            double r2 = 1e-12, s2 = 1e-12;
            for (int k = 0; k < 3; k++) {
                r2 += xs[k] * xs[k];
                s2 += xs[k] * xs[k] / (semiaxes[k] * semiaxes[k]);
            }
            double r = std::sqrt(r2), ss = std::sqrt(s2);
            double d = r / ss - r;  // signed distance, > 0 inside
            double dUdd;
            if (d > 0) {
                double wa = 0.5 * (af[i] + wall_fa);
                double wb = 0.5 * (bf[i] + wall_fb);
                double cc = wa * c_soft23(d * d, a_rep, iha2)
                          + wb * c_soft83(d * d, b_rep, ihb2);
                dUdd = -cc * d;
            } else {
                dUdd = wall_pack * d;
            }
            double s3 = s2 * ss;
            double* fi = &f[i].x;
            for (int k = 0; k < 3; k++) {
                double dd_dx = xs[k] * ((1.0 / ss - 1.0) / r
                                        - r / (s3 * semiaxes[k] * semiaxes[k]));
                fi[k] += -dUdd * dd_dx;
                double dd_da = r * xs[k] * xs[k]
                    / (s3 * semiaxes[k] * semiaxes[k] * semiaxes[k]);
                reaction[k] += -dUdd * dd_da;
            }
        }

        // BD update (mobility 1).
        for (int i = 0; i < n; i++) {
            x[i].x += f[i].x * dt + noise_amp * normal(rng);
            x[i].y += f[i].y * dt + noise_amp * normal(rng);
            x[i].z += f[i].z * dt + noise_amp * normal(rng);
        }

        // Contact map at post-update positions and post-step distance.
        if (step % contact_every == 0 && step > burnin) {
            const double cd = contact_dist0 * scale_at(step * dt);
            const double cd2 = cd * cd;
            std::fill(head.begin(), head.end(), -1);
            for (int i = 0; i < n; i++) {
                int c = cell_of(x[i]);
                next[i] = head[c];
                head[c] = i;
            }
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
                            if (dx * dx + dy * dy + dz * dz < cd2)
                                contacts[(std::uint64_t(i) << 32)
                                         | std::uint64_t(j)]++;
                        }
                    }
                }
            }
        }

        // Wall-inflation ODE (simulation_driver_interphase.cpp:79-90).
        for (int k = 0; k < 3; k++)
            semiaxes[k] += dt * wall_mob * (reaction[k] - wall_spring * semiaxes[k]);
    }

    // Summary stats: bond-length second moment + radius of gyration.
    double bond_r2 = 0.0; int n_bonds = 0;
    for (int ch = 0; ch < chains; ch++) {
        int s0 = ch * chain_len, s1 = s0 + chain_len;
        for (int i = s0; i + 1 < s1; i++) {
            double dx = x[i].x - x[i + 1].x;
            double dy = x[i].y - x[i + 1].y;
            double dz = x[i].z - x[i + 1].z;
            bond_r2 += dx * dx + dy * dy + dz * dz;
            n_bonds++;
        }
    }
    double cx = 0, cy = 0, cz = 0;
    for (int i = 0; i < n; i++) { cx += x[i].x; cy += x[i].y; cz += x[i].z; }
    cx /= n; cy /= n; cz /= n;
    double rg2 = 0;
    for (int i = 0; i < n; i++) {
        double dx = x[i].x - cx, dy = x[i].y - cy, dz = x[i].z - cz;
        rg2 += dx * dx + dy * dy + dz * dz;
    }
    rg2 /= n;

    std::FILE* out = std::fopen(out_path, "w");
    std::uint64_t total = 0;
    for (auto& kv : contacts) {
        std::fprintf(out, "%u %u %u\n",
                     unsigned(kv.first >> 32), unsigned(kv.first & 0xffffffffu),
                     kv.second);
        total += kv.second;
    }
    std::fclose(out);
    // Nucleolus-mode statistics: nucleolar radius of gyration (droplet
    // clustering) and mean NOR-bond squared length.
    double nuc_rg2 = 0.0, nuc_bond_r2 = 0.0;
    if (n_nuc > 0) {
        double mx = 0, my = 0, mz = 0;
        for (int t = 0; t < n_nuc; t++) {
            mx += x[n_chainbeads + t].x;
            my += x[n_chainbeads + t].y;
            mz += x[n_chainbeads + t].z;
        }
        mx /= n_nuc; my /= n_nuc; mz /= n_nuc;
        for (int t = 0; t < n_nuc; t++) {
            double dx = x[n_chainbeads + t].x - mx;
            double dy = x[n_chainbeads + t].y - my;
            double dz = x[n_chainbeads + t].z - mz;
            nuc_rg2 += dx * dx + dy * dy + dz * dz;
            int i = nor_of[t];
            double bx = x[i].x - x[n_chainbeads + t].x;
            double by = x[i].y - x[n_chainbeads + t].y;
            double bz = x[i].z - x[n_chainbeads + t].z;
            nuc_bond_r2 += bx * bx + by * by + bz * bz;
        }
        nuc_rg2 /= n_nuc;
        nuc_bond_r2 /= n_nuc;
    }

    std::printf(
        "{\"bond_r2_mean\": %.8g, \"rg\": %.8g, \"pairs\": %zu, "
        "\"events\": %llu, \"semiaxes\": [%.6g, %.6g, %.6g], "
        "\"nuc_rg\": %.8g, \"nuc_bond_r2_mean\": %.8g}\n",
        bond_r2 / std::max(n_bonds, 1), std::sqrt(rg2), contacts.size(),
        (unsigned long long)total, semiaxes[0], semiaxes[1], semiaxes[2],
        std::sqrt(nuc_rg2), nuc_bond_r2);
    return 0;
}
