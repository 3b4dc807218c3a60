// Ceres oracle for the local-BA solver (alvaar_tpu/solvers/ba.py).
//
// Solves the SAME anchored-inverse-depth windowed BA problem the TPU
// solver sees — identical parameterization (T_cw pose blocks, 1-param
// inverse depth anchored at a keyframe), identical Huber loss, identical
// constant-pose flags — with the reference's actual optimizer (the
// vendored Ceres 2.0 built natively by tools/ref_native/build.sh; the
// reference's own local BA is src/slam/src/optimizer.cpp:20-262).  The
// cost functor below is written fresh from the standard anchored
// inverse-depth model (the same math documented in solvers/ba.py); no
// reference code is used.
//
// Input (text, stdin or argv[1]):
//   fx fy cx cy huber_delta max_iters
//   W
//   W lines:  valid constant qw qx qy qz tx ty tz      (T_cw)
//   N_obs
//   N lines:  obs_kf anchor_kf lm_id mx my invdepth u v
//     (per-OBSERVATION rows: anchor coords + current inverse depth are
//      repeated for every observation of the landmark; lm_id groups them)
//
// Output (stdout):
//   final_cost n_residuals
//   W lines:   qw qx qy qz tx ty tz                    (optimized T_cw)
//   L lines:   lm_id invdepth                          (optimized depths)

#include <cmath>
#include <cstdio>
#include <map>
#include <memory>
#include <vector>

#include "ceres/ceres.h"
#include "ceres/rotation.h"

namespace {

// Reprojection of landmark (anchored at `anch` with normalized coords
// (mx, my) and inverse depth lambda) into observer `obs`, both T_cw as
// [qw qx qy qz tx ty tz].
struct AnchInvDepthReproj {
  AnchInvDepthReproj(double u, double v, double mx, double my, double fx,
                     double fy, double cx, double cy)
      : u_(u), v_(v), mx_(mx), my_(my), fx_(fx), fy_(fy), cx_(cx), cy_(cy) {}

  template <typename T>
  bool operator()(const T* obs, const T* anch, const T* ilam, T* res) const {
    // anchor-camera point
    T lam = ilam[0];
    if (lam < T(1e-6)) lam = T(1e-6);
    const T Xa[3] = {T(mx_) / lam, T(my_) / lam, T(1.0) / lam};
    // world: X_w = R_a^T (Xa - t_a)
    T Xa_t[3] = {Xa[0] - anch[4], Xa[1] - anch[5], Xa[2] - anch[6]};
    const T qa_conj[4] = {anch[0], -anch[1], -anch[2], -anch[3]};
    T Xw[3];
    ceres::QuaternionRotatePoint(qa_conj, Xa_t, Xw);
    // observer camera: X_c = R_o X_w + t_o
    T Xc[3];
    ceres::QuaternionRotatePoint(obs, Xw, Xc);
    Xc[0] += obs[4];
    Xc[1] += obs[5];
    Xc[2] += obs[6];
    T z = Xc[2];
    if (z < T(1e-6) && z > T(-1e-6)) z = T(1e-6);
    res[0] = T(fx_) * Xc[0] / z + T(cx_) - T(u_);
    res[1] = T(fy_) * Xc[1] / z + T(cy_) - T(v_);
    return true;
  }

  double u_, v_, mx_, my_, fx_, fy_, cx_, cy_;
};

// [qw qx qy qz tx ty tz] with quaternion manifold on the first 4.
ceres::LocalParameterization* PoseParameterization() {
  return new ceres::ProductParameterization(
      new ceres::QuaternionParameterization(),
      new ceres::IdentityParameterization(3));
}

}  // namespace

int main(int argc, char** argv) {
  FILE* in = stdin;
  if (argc > 1) {
    in = std::fopen(argv[1], "r");
    if (!in) {
      std::fprintf(stderr, "cannot open %s\n", argv[1]);
      return 1;
    }
  }

  double fx, fy, cx, cy, huber_delta;
  int max_iters = 0, W = 0;
  if (std::fscanf(in, "%lf %lf %lf %lf %lf %d", &fx, &fy, &cx, &cy,
                  &huber_delta, &max_iters) != 6 ||
      std::fscanf(in, "%d", &W) != 1) {
    std::fprintf(stderr, "bad header\n");
    return 1;
  }

  std::vector<std::array<double, 7>> poses(W);
  std::vector<int> valid(W), constant(W);
  for (int w = 0; w < W; ++w) {
    auto& p = poses[w];
    if (std::fscanf(in, "%d %d %lf %lf %lf %lf %lf %lf %lf", &valid[w],
                    &constant[w], &p[0], &p[1], &p[2], &p[3], &p[4], &p[5],
                    &p[6]) != 9) {
      std::fprintf(stderr, "bad pose row %d\n", w);
      return 1;
    }
  }

  int n_obs = 0;
  if (std::fscanf(in, "%d", &n_obs) != 1) return 1;

  struct Obs {
    int kf, anchor, lm;
    double mx, my, ilam, u, v;
  };
  std::vector<Obs> obs(n_obs);
  std::map<int, double> ilam;  // landmark id -> inverse-depth block
  for (int i = 0; i < n_obs; ++i) {
    Obs& o = obs[i];
    if (std::fscanf(in, "%d %d %d %lf %lf %lf %lf %lf", &o.kf, &o.anchor,
                    &o.lm, &o.mx, &o.my, &o.ilam, &o.u, &o.v) != 8) {
      std::fprintf(stderr, "bad obs row %d\n", i);
      return 1;
    }
    ilam.emplace(o.lm, o.ilam);
  }
  if (in != stdin) std::fclose(in);

  ceres::Problem problem;
  std::vector<bool> pose_added(W, false);
  auto add_pose = [&](int w) {
    if (!pose_added[w]) {
      problem.AddParameterBlock(poses[w].data(), 7, PoseParameterization());
      pose_added[w] = true;
    }
  };

  ceres::LossFunction* loss = new ceres::HuberLoss(huber_delta);
  for (const Obs& o : obs) {
    if (!valid[o.kf] || !valid[o.anchor]) continue;
    add_pose(o.kf);
    add_pose(o.anchor);
    auto* cost = new ceres::AutoDiffCostFunction<AnchInvDepthReproj, 2, 7, 7, 1>(
        new AnchInvDepthReproj(o.u, o.v, o.mx, o.my, fx, fy, cx, cy));
    problem.AddResidualBlock(cost, loss, poses[o.kf].data(),
                             poses[o.anchor].data(), &ilam.at(o.lm));
  }

  for (int w = 0; w < W; ++w)
    if (pose_added[w] && constant[w])
      problem.SetParameterBlockConstant(poses[w].data());

  ceres::Solver::Options opts;
  opts.linear_solver_type = ceres::DENSE_SCHUR;
  opts.trust_region_strategy_type = ceres::LEVENBERG_MARQUARDT;
  opts.max_num_iterations = max_iters;
  opts.minimizer_progress_to_stdout = false;
  opts.logging_type = ceres::SILENT;
  ceres::Solver::Summary summary;
  ceres::Solve(opts, &problem, &summary);
  std::fprintf(stderr, "%s\n", summary.BriefReport().c_str());

  // Ceres cost = 1/2 sum rho; report sum rho to match solvers/ba.py.
  std::printf("%.9e %d\n", 2.0 * summary.final_cost,
              summary.num_residual_blocks);
  for (int w = 0; w < W; ++w) {
    const auto& p = poses[w];
    std::printf("%.9e %.9e %.9e %.9e %.9e %.9e %.9e\n", p[0], p[1], p[2],
                p[3], p[4], p[5], p[6]);
  }
  for (const auto& kv : ilam)
    std::printf("%d %.9e\n", kv.first, kv.second);
  return 0;
}
