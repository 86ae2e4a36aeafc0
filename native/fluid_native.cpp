// fluid_native: serial CPU MLS-MPM engine (C++).
//
// Two roles:
//  1. the measured CPU baseline for BENCH vs_baseline — the reference
//     (GossiperLoturot/fluid-rs) is a serial Rust binary with no published
//     numbers and no Rust toolchain exists in this environment, so this
//     from-scratch serial C++ engine with identical semantics provides the
//     denominator (SURVEY.md §6);
//  2. an optional native host engine behind fluid_tpu.native (ctypes), the
//     framework's non-accelerated fallback path.
//
// Semantics match the reference pipeline exactly (same phases/constants):
//   p2g_1   scatter mass + APIC momentum      (2d_multi.rs:148-180)
//   p2g_2   density gather, Tait EOS, stress  (2d_multi.rs:182-238)
//   update  momentum->velocity + gravity      (2d_multi.rs:240-250)
//   g2p     gather, advect, mouse, walls      (2d_multi.rs:252-359)
// including quirks Q2 (un-scaled soft-wall lookahead) and Q3 (post-advect
// mouse impulse; xy-plane only in 3D).
//
// Grid: dense over the padded domain (the set_rect geometry), row-major with
// x the slowest axis to match the JAX layout. Implementation is fresh C++
// (templates over DIM, flat SoA arrays) — not a transcription of the Rust.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct Params {
  float dt;
  float rest_density;
  float dynamic_viscosity;
  float eos_stiffness;
  float eos_power;
  float pressure_floor;
  float mouse_radius;
  float boundary_damp_dist;
  float gravity[3];
  float clip_lo[3];
  float clip_hi[3];
  int32_t grid_origin[3];
  int32_t grid_shape[3];
};

template <int DIM>
struct Engine {
  static constexpr int K = DIM == 2 ? 9 : 27;

  const Params& prm;
  int64_t ncells;
  int64_t stride[DIM];  // C-order, axis 0 slowest

  float* grid_m;   // [ncells]
  float* grid_v;   // [ncells * DIM]

  explicit Engine(const Params& p, float* gm, float* gv) : prm(p) {
    ncells = 1;
    for (int d = 0; d < DIM; ++d) ncells *= p.grid_shape[d];
    int64_t s = 1;
    for (int d = DIM - 1; d >= 0; --d) {
      stride[d] = s;
      s *= p.grid_shape[d];
    }
    grid_m = gm;
    grid_v = gv;
  }

  static void weights(const float diff[DIM], float w[3][DIM]) {
    for (int d = 0; d < DIM; ++d) {
      const float x = diff[d];
      w[0][d] = 0.5f * (0.5f - x) * (0.5f - x);
      w[1][d] = 0.75f - x * x;
      w[2][d] = 0.5f * (0.5f + x) * (0.5f + x);
    }
  }

  // Iterate the 3^DIM stencil; calls fn(flat_cell_or_-1, w, dpos).
  template <typename F>
  void for_taps(const float* pos, F&& fn) const {
    int32_t cell[DIM];
    float diff[DIM];
    for (int d = 0; d < DIM; ++d) {
      cell[d] = (int32_t)std::floor(pos[d]);
      diff[d] = pos[d] - ((float)cell[d] + 0.5f);
    }
    float w[3][DIM];
    weights(diff, w);
    int off[DIM];
    for (int k = 0; k < K; ++k) {
      int t = k;
      for (int d = 0; d < DIM; ++d) {  // x fastest (reference grid_search order)
        off[d] = t % 3;
        t /= 3;
      }
      float wk = 1.0f;
      float dpos[DIM];
      int64_t flat = 0;
      bool ok = true;
      for (int d = 0; d < DIM; ++d) {
        const int32_t c = cell[d] + off[d] - 1;
        const int32_t i = c - prm.grid_origin[d];
        if (i < 0 || i >= prm.grid_shape[d]) ok = false;
        wk *= w[off[d]][d];
        dpos[d] = ((float)c + 0.5f) - pos[d];
        flat += (int64_t)i * stride[d];
      }
      fn(ok ? flat : int64_t(-1), wk, dpos);
    }
  }

  void step(int64_t n, float* pos, float* vel, float* C, float* mass,
            float* density, float* pressure, int substeps,
            const float* mouse) const {
    for (int it = 0; it < substeps; ++it) substep(n, pos, vel, C, mass, density, pressure, mouse);
  }

  void substep(int64_t n, float* pos, float* vel, float* Cm, float* mass,
               float* density, float* pressure, const float* mouse) const {
    std::memset(grid_m, 0, sizeof(float) * ncells);
    std::memset(grid_v, 0, sizeof(float) * ncells * DIM);

    // p2g_1
    for (int64_t p = 0; p < n; ++p) {
      const float* xp = pos + p * DIM;
      const float* vp = vel + p * DIM;
      const float* Cp = Cm + p * DIM * DIM;
      const float mp = mass[p];
      for_taps(xp, [&](int64_t flat, float w, const float dpos[DIM]) {
        if (flat < 0) return;
        const float mc = w * mp;
        grid_m[flat] += mc;
        float* gv = grid_v + flat * DIM;
        for (int i = 0; i < DIM; ++i) {
          float q = 0.0f;
          for (int j = 0; j < DIM; ++j) q += Cp[i * DIM + j] * dpos[j];
          gv[i] += mc * (vp[i] + q);
        }
      });
    }

    // p2g_2
    for (int64_t p = 0; p < n; ++p) {
      const float* xp = pos + p * DIM;
      const float* Cp = Cm + p * DIM * DIM;
      float rho = 0.0f;
      for_taps(xp, [&](int64_t flat, float w, const float[DIM]) {
        if (flat < 0) return;
        rho += grid_m[flat] * w;
      });
      const float volume = rho > 0.0f ? mass[p] / rho : 0.0f;
      float prs = prm.eos_stiffness *
                  (std::pow(rho / prm.rest_density, prm.eos_power) - 1.0f);
      if (prs < prm.pressure_floor) prs = prm.pressure_floor;
      density[p] = rho;
      pressure[p] = prs;

      float term[DIM][DIM];
      for (int i = 0; i < DIM; ++i)
        for (int j = 0; j < DIM; ++j) {
          const float strain = Cp[i * DIM + j] + Cp[j * DIM + i];
          const float stress =
              (i == j ? -prs : 0.0f) + prm.dynamic_viscosity * strain;
          term[i][j] = -4.0f * volume * stress * prm.dt;
        }
      for_taps(xp, [&](int64_t flat, float w, const float dpos[DIM]) {
        if (flat < 0) return;
        float* gv = grid_v + flat * DIM;
        for (int i = 0; i < DIM; ++i) {
          float f = 0.0f;
          for (int j = 0; j < DIM; ++j) f += term[i][j] * dpos[j];
          gv[i] += w * f;
        }
      });
    }

    // update_grid
    for (int64_t c = 0; c < ncells; ++c) {
      const float m = grid_m[c];
      float* gv = grid_v + c * DIM;
      if (m > 0.0f) {
        for (int d = 0; d < DIM; ++d) gv[d] = gv[d] / m + prm.dt * prm.gravity[d];
      } else {
        for (int d = 0; d < DIM; ++d) gv[d] = 0.0f;
      }
    }

    // g2p
    for (int64_t p = 0; p < n; ++p) {
      float* xp = pos + p * DIM;
      float* vp = vel + p * DIM;
      float* Cp = Cm + p * DIM * DIM;
      float v[DIM] = {0};
      float B[DIM][DIM] = {{0}};
      for_taps(xp, [&](int64_t flat, float w, const float dpos[DIM]) {
        if (flat < 0) return;
        const float* gv = grid_v + flat * DIM;
        for (int i = 0; i < DIM; ++i) {
          const float wv = gv[i] * w;
          v[i] += wv;
          for (int j = 0; j < DIM; ++j) B[i][j] += wv * dpos[j];
        }
      });
      for (int i = 0; i < DIM; ++i)
        for (int j = 0; j < DIM; ++j) Cp[i * DIM + j] = 4.0f * B[i][j];
      for (int d = 0; d < DIM; ++d) xp[d] += v[d] * prm.dt;

      if (mouse) {  // post-advect, xy plane (quirk Q3)
        const float dx = xp[0] - mouse[0];
        const float dy = xp[1] - mouse[1];
        const float d2 = dx * dx + dy * dy;
        if (d2 < prm.mouse_radius * prm.mouse_radius && d2 > 0.0f) {
          const float inv = 1.0f / std::sqrt(d2);
          v[0] += dx * inv;
          v[1] += dy * inv;
        }
      }

      for (int d = 0; d < DIM; ++d) {
        if (xp[d] < prm.clip_lo[d]) xp[d] = prm.clip_lo[d];
        if (xp[d] > prm.clip_hi[d]) xp[d] = prm.clip_hi[d];
      }
      for (int d = 0; d < DIM; ++d) {  // un-scaled lookahead (quirk Q2)
        const float nxt = xp[d] + v[d];
        const float wmin = prm.clip_lo[d] + prm.boundary_damp_dist;
        const float wmax = prm.clip_hi[d] - prm.boundary_damp_dist;
        if (nxt < wmin) v[d] += wmin - nxt;
        if (nxt > wmax) v[d] += wmax - nxt;
      }
      for (int d = 0; d < DIM; ++d) vp[d] = v[d];
    }
  }
};

}  // namespace

extern "C" {

// Run `substeps` substeps in place. grid scratch must hold ncells and
// ncells*dim floats. mouse: pointer to 2 floats or nullptr.
void fluid_native_step(int dim, int64_t n, float* pos, float* vel, float* C,
                       float* mass, float* density, float* pressure,
                       int substeps, const Params* prm, float* grid_m,
                       float* grid_v, const float* mouse) {
  if (dim == 2) {
    Engine<2>(*prm, grid_m, grid_v).step(n, pos, vel, C, mass, density, pressure, substeps, mouse);
  } else {
    Engine<3>(*prm, grid_m, grid_v).step(n, pos, vel, C, mass, density, pressure, substeps, mouse);
  }
}

int64_t fluid_native_abi_version() { return 1; }

}  // extern "C"
