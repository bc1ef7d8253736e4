// Parity-oracle shim: compiles the UNMODIFIED reference headers
// (/root/reference/dial_mpc_eigen/include/{dial-core.h,unitree-go2-env.h})
// against the real libmujoco and drives them with a deterministic RNG,
// dumping everything the JAX rebuild needs to be asserted against the
// *actual compiled reference* instead of a Python emulator of it:
//   - the exact N(0,1) noise each reverse_once drew (recovered by replaying
//     the draw loop of dial-core.h:477-495 on a value-copied engine),
//   - the physics state (qpos/qvel/qacc_warmstart) at entry of every
//     reverse_once call and every executed env.step (for state-resynced
//     per-decision comparison at benchmark scale),
//   - each reverse_once's output node trajectory Ybar and per-candidate
//     mean rewards (ReverseInfo.rews),
//   - the executed action / reward / post-step qpos per control step.
//
// The control flow below replicates the reference driver
// dial-core-test.cpp:6-109 (warm-start `reverse`, then the receding-horizon
// loop with factor_h = sigma_control_[h] * traj_diffuse_factor^i); all the
// algorithm math — spline, rollouts (quirk Q1 shared mjData), scoring,
// softmax, update — runs inside the included reference headers, untouched.
//
// Usage:
//   parity_shim <model.xml> <out_dir> Hsample Hnode Nsample Ndiffuse
//               Ndiffuse_init n_steps seed warmstart(0|1)
//
// Outputs (raw little-endian float64, shapes in meta.txt):
//   z.bin      (n_anneals, Nsample, Hnode+1, nu)   raw N(0,1) draws
//   phys_in.bin(n_anneals, nq+nv+nv)               state at anneal entry
//   nodes.bin  (n_anneals, Hnode+1, nu)            Ybar after each anneal
//   rews.bin   (n_anneals, Nsample+1)              per-candidate mean rewards
//   exec_in.bin(n_steps, nq+nv+nv)                 state before executed step
//   actions.bin(n_steps, nu)                       executed first-node action
//   reward.bin (n_steps,)                          executed-step reward
//   qpos.bin   (n_steps, nq)                       qpos after executed step
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "dial-core.h"  // reference header (includes unitree-go2-env.h)

namespace {

struct Dump {
  FILE* f;
  explicit Dump(const std::string& path) {
    f = std::fopen(path.c_str(), "wb");
    if (!f) {
      std::fprintf(stderr, "cannot open %s\n", path.c_str());
      std::exit(2);
    }
  }
  ~Dump() { std::fclose(f); }
  void put(const double* p, size_t n) { std::fwrite(p, sizeof(double), n, f); }
  void put(const Eigen::MatrixXd& m) {
    // row-major dump so numpy reshape((rows, cols)) matches
    for (int r = 0; r < m.rows(); ++r)
      for (int c = 0; c < m.cols(); ++c) {
        double v = m(r, c);
        std::fwrite(&v, sizeof(double), 1, f);
      }
  }
  void put(const Eigen::VectorXd& v) { put(v.data(), (size_t)v.size()); }
};

// Replay the exact noise-draw loop of MBDPI::reverse_once
// (dial-core.h:477-495: fresh normal_distribution, draws ordered
// s-major, then node i, then dim j) on a value-copied engine, so the
// recovered z sequence is bit-identical to what the real call consumes.
std::vector<double> extract_noise(std::mt19937_64 rng_copy, int Nsample,
                                  int Hnode1, int nu) {
  std::normal_distribution<double> dist(0.0, 1.0);
  std::vector<double> z((size_t)Nsample * Hnode1 * nu);
  size_t k = 0;
  for (int s = 0; s < Nsample; ++s)
    for (int i = 0; i < Hnode1; ++i)
      for (int j = 0; j < nu; ++j) z[k++] = dist(rng_copy);
  return z;
}

void dump_phys(Dump& d, const mjModel* m, const mjData* dd) {
  d.put(dd->qpos, m->nq);
  d.put(dd->qvel, m->nv);
  d.put(dd->qacc_warmstart, m->nv);
}

}  // namespace

// Probe mode: decomposed checks of the reference stack (spline, one env
// step, one rollout) against deterministic inputs, for localizing any
// full-loop mismatch.  Invoked as: parity_shim model.xml out_dir probe
static int run_probe(const std::string& model_path, const std::string& out) {
  DialConfig cfg;
  cfg.Hsample = 5;
  cfg.Hnode = 2;
  cfg.Nsample = 1;
  cfg.temp_sample = 0.05;
  cfg.ctrl_dt = 0.02;
  cfg.horizon_diffuse_factor = 0.9;

  UnitreeGo2EnvConfig go2_config;
  go2_config.kp = 30.0;
  go2_config.kd = 0.65;
  go2_config.default_vx = 0.8;
  go2_config.ramp_up_time = 1.0;
  go2_config.gait = "stand";
  go2_config.timestep = 0.0025;
  go2_config.randomize_tasks = false;
  go2_config.leg_control = "torque";

  UnitreeGo2Env env(go2_config, model_path);
  MBDPI mbdpi(cfg, env);
  std::mt19937_64 rng(0);
  EnvState state = env.reset(rng);
  const mjModel* m = state.model;
  const int nu = mbdpi.nu_, H1 = cfg.Hnode + 1;

  // 1) spline: node2u of a deterministic node matrix
  Eigen::MatrixXd Y(H1, nu);
  for (int i = 0; i < H1; ++i)
    for (int j = 0; j < nu; ++j) Y(i, j) = std::sin(0.7 * i + 0.3 * j) * 0.5;
  Eigen::MatrixXd us = node2u(Y, mbdpi.step_nodes_, mbdpi.step_us_);
  Dump dsp(out + "/probe_node2u.bin");
  dsp.put(us);
  Eigen::MatrixXd yb = u2node(us, mbdpi.step_us_, mbdpi.step_nodes_);
  Dump du2(out + "/probe_u2node.bin");
  du2.put(yb);

  // 2) one env.step from reset with a fixed action
  Eigen::VectorXd act(nu);
  for (int j = 0; j < nu; ++j) act(j) = 0.1 * std::cos(0.5 * j);
  EnvState s1 = env.step(state, act);
  Dump ds1(out + "/probe_step.bin");
  ds1.put(s1.data->qpos, m->nq);
  ds1.put(s1.data->qvel, m->nv);
  double rr = s1.reward;
  ds1.put(&rr, 1);

  // 3) rollout_us from that state with the spline's dense controls
  auto ro = mbdpi.rollout_us(s1, us);
  Dump dro(out + "/probe_rollout.bin");
  dro.put(std::get<0>(ro));

  FILE* meta = std::fopen((out + "/meta.txt").c_str(), "w");
  std::fprintf(meta, "probe=1\nHsample=%d\nHnode=%d\nnu=%d\nnq=%d\nnv=%d\n",
               cfg.Hsample, cfg.Hnode, nu, m->nq, m->nv);
  std::fclose(meta);
  return 0;
}

int main(int argc, char** argv) {
  if (argc == 4 && std::string(argv[3]) == "probe")
    return run_probe(argv[1], argv[2]);
  if (argc != 11) {
    std::fprintf(stderr,
                 "usage: %s model.xml out_dir Hsample Hnode Nsample Ndiffuse "
                 "Ndiffuse_init n_steps seed warmstart\n",
                 argv[0]);
    return 1;
  }
  const std::string model_path = argv[1];
  const std::string out = argv[2];
  DialConfig cfg;  // defaults + the dial-core-test.cpp:8-32 scalars
  cfg.Hsample = std::atoi(argv[3]);
  cfg.Hnode = std::atoi(argv[4]);
  cfg.Nsample = std::atoi(argv[5]);
  cfg.Ndiffuse = std::atoi(argv[6]);
  cfg.Ndiffuse_init = std::atoi(argv[7]);
  cfg.n_steps = std::atoi(argv[8]);
  cfg.seed = std::atoi(argv[9]);
  const bool warmstart = std::atoi(argv[10]) != 0;
  cfg.temp_sample = 0.05;
  cfg.ctrl_dt = 0.02;
  cfg.horizon_diffuse_factor = 0.9;
  cfg.traj_diffuse_factor = 0.5;

  UnitreeGo2EnvConfig go2_config;  // dial-core-test.cpp:21-32
  go2_config.kp = 30.0;
  go2_config.kd = 0.65;
  go2_config.action_scale = 1.0;
  go2_config.default_vx = 0.8;
  go2_config.ramp_up_time = 1.0;
  go2_config.gait = "stand";
  go2_config.timestep = 0.0025;
  go2_config.randomize_tasks = false;
  go2_config.leg_control = "torque";

  UnitreeGo2Env env(go2_config, model_path);
  MBDPI mbdpi(cfg, env);
  std::mt19937_64 rng(cfg.seed);
  EnvState state_init = env.reset(rng);
  const mjModel* m = state_init.model;
  const int nu = mbdpi.nu_, H1 = cfg.Hnode + 1;

  Dump dz(out + "/z.bin"), dphys(out + "/phys_in.bin"),
      dnodes(out + "/nodes.bin"), drews(out + "/rews.bin"),
      dexec(out + "/exec_in.bin"), dact(out + "/actions.bin"),
      drew(out + "/reward.bin"), dqpos(out + "/qpos.bin");
  int n_anneals = 0;

  auto anneal = [&](EnvState& st, Eigen::MatrixXd& Y,
                    const Eigen::VectorXd& scale) {
    dz.put(extract_noise(rng, cfg.Nsample, H1, nu).data(),
           (size_t)cfg.Nsample * H1 * nu);
    dump_phys(dphys, m, st.data);
    auto res = mbdpi.reverse_once(st, rng, Y, scale);
    Y = std::get<0>(res);
    dnodes.put(Y);
    drews.put(std::get<1>(res).rews);
    ++n_anneals;
  };

  Eigen::MatrixXd Y0 = Eigen::MatrixXd::Zero(H1, nu);
  if (warmstart) {
    // MBDPI::reverse unrolled (dial-core.h:598-614) so each inner
    // reverse_once passes through the dumping wrapper above
    for (int i = cfg.Ndiffuse - 1; i >= 1; --i) {
      Eigen::VectorXd scale =
          Eigen::VectorXd::Constant(H1, mbdpi.sigmas_(i));
      anneal(state_init, Y0, scale);
    }
  }

  EnvState cur_state = state_init;
  for (int t = 0; t < cfg.n_steps; ++t) {
    Eigen::VectorXd action = Y0.row(0);
    dump_phys(dexec, m, cur_state.data);
    dact.put(action);
    EnvState next_state = env.step(cur_state, action);
    double r = next_state.reward;
    drew.put(&r, 1);
    dqpos.put(next_state.data->qpos, m->nq);

    Y0 = mbdpi.shift(Y0);
    int n_diffuse = (t == 0) ? cfg.Ndiffuse_init : cfg.Ndiffuse;
    for (int i = 0; i < n_diffuse; ++i) {
      Eigen::VectorXd factor(H1);
      for (int h = 0; h < H1; ++h)
        factor(h) =
            mbdpi.sigma_control_(h) * std::pow(cfg.traj_diffuse_factor, (double)i);
      anneal(next_state, Y0, factor);
    }
    cur_state = next_state;
  }

  FILE* meta = std::fopen((out + "/meta.txt").c_str(), "w");
  std::fprintf(meta,
               "n_anneals=%d\nNsample=%d\nHnode=%d\nHsample=%d\nnu=%d\n"
               "n_steps=%d\nnq=%d\nnv=%d\nwarmstart=%d\nNdiffuse=%d\n"
               "Ndiffuse_init=%d\n",
               n_anneals, cfg.Nsample, cfg.Hnode, cfg.Hsample, nu, cfg.n_steps,
               m->nq, m->nv, warmstart ? 1 : 0, cfg.Ndiffuse,
               cfg.Ndiffuse_init);
  std::fclose(meta);
  return 0;
}
