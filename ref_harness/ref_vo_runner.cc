/*
 * Minimal driver for the *reference* bpvo library, used for head-to-head
 * accuracy parity runs against bpvo_tpu (see PARITY_RESULTS.md).
 *
 * Reads a bpvo config file (AlgorithmParameters(std::string) ctor,
 * /root/reference/bpvo/types.cc:69-109), an image printf-pattern (8-bit
 * grayscale PNG/PGM) and a disparity printf-pattern (.pfm float), runs
 * VisualOdometry::addFrame over the sequence and writes:
 *   <prefix>_kitti.txt  - 3x4 KITTI-format rows of the accumulated trajectory
 *   <prefix>_iters.txt  - GN iterations at maxTestLevel per frame
 *   <prefix>_kf.txt     - keyframe flag (0/1) per frame
 *   <prefix>_time.txt   - wall ms per addFrame
 *
 * This file is OUR code (not part of the reference); it links the reference
 * library built by ref_harness/CMakeLists.txt.
 */
#include <bpvo/vo.h>
#include <bpvo/trajectory.h>
#include <bpvo/types.h>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

using namespace bpvo;

static std::string format_index(const std::string& pattern, int i)
{
  char buf[1024];
  snprintf(buf, sizeof(buf), pattern.c_str(), i);
  return std::string(buf);
}

int main(int argc, char** argv)
{
  // crude fixed-position args to avoid boost::program_options
  if(argc < 10) {
    fprintf(stderr,
            "usage: %s <config> <image_pattern> <disparity_pattern> "
            "<fx> <fy> <cx> <cy> <baseline> <nframes> [out_prefix] [first_index]\n",
            argv[0]);
    return 1;
  }

  const std::string config_file = argv[1];
  const std::string image_pattern = argv[2];
  const std::string disparity_pattern = argv[3];
  const float fx = std::stof(argv[4]);
  const float fy = std::stof(argv[5]);
  const float cx = std::stof(argv[6]);
  const float cy = std::stof(argv[7]);
  const float baseline = std::stof(argv[8]);
  const int nframes = std::stoi(argv[9]);
  const std::string out_prefix = argc > 10 ? argv[10] : "ref_out";
  const int first_index = argc > 11 ? std::stoi(argv[11]) : 0;

  AlgorithmParameters params(config_file);

  Matrix33 K;
  K << fx, 0.f, cx, 0.f, fy, cy, 0.f, 0.f, 1.f;

  cv::Mat I0 = cv::imread(format_index(image_pattern, first_index),
                          cv::IMREAD_GRAYSCALE);
  if(I0.empty()) {
    fprintf(stderr, "cannot read first image %s\n",
            format_index(image_pattern, first_index).c_str());
    return 1;
  }

  VisualOdometry vo(K, baseline, ImageSize(I0.rows, I0.cols), params);

  std::vector<int> iters;
  std::vector<int> kf_flags;
  std::vector<double> times_ms;

  double total_ms = 0.0;
  int processed = 0;
  for(int i = 0; i < nframes; ++i) {
    const int fi = first_index + i;
    cv::Mat I = cv::imread(format_index(image_pattern, fi), cv::IMREAD_GRAYSCALE);
    cv::Mat D = cv::imread(format_index(disparity_pattern, fi), cv::IMREAD_UNCHANGED);
    if(I.empty() || D.empty()) {
      fprintf(stderr, "stopping at frame %d (missing files)\n", fi);
      break;
    }
    if(D.type() != CV_32FC1)
      D.convertTo(D, CV_32FC1);
    if(!I.isContinuous()) I = I.clone();
    if(!D.isContinuous()) D = D.clone();

    auto t0 = std::chrono::steady_clock::now();
    Result result = vo.addFrame(I.ptr<const uint8_t>(), D.ptr<const float>());
    auto t1 = std::chrono::steady_clock::now();
    const double ms = std::chrono::duration<double, std::milli>(t1 - t0).count();

    total_ms += ms;
    times_ms.push_back(ms);
    kf_flags.push_back(result.isKeyFrame ? 1 : 0);
    const int lvl = params.maxTestLevel;
    iters.push_back((int)result.optimizerStatistics.size() > lvl
                        ? result.optimizerStatistics[lvl].numIterations
                        : 0);
    ++processed;
    if(i % 20 == 0) {
      fprintf(stdout, "frame %4d  %6.1f ms  kf=%d iters=%d\n", fi, ms,
              kf_flags.back(), iters.back());
      fflush(stdout);
    }
  }

  fprintf(stdout, "\nprocessed %d frames, mean %.2f ms/frame (%.1f Hz)\n",
          processed, total_ms / std::max(1, processed),
          1000.0 * processed / std::max(1.0, total_ms));

  const Trajectory& traj = vo.trajectory();
  {
    std::ofstream ofs(out_prefix + "_kitti.txt");
    for(size_t i = 0; i < traj.size(); ++i) {
      const Matrix44& T = traj[(int)i];
      for(int r = 0; r < 3; ++r)
        for(int c = 0; c < 4; ++c)
          ofs << T(r, c) << (r == 2 && c == 3 ? "" : " ");
      ofs << "\n";
    }
  }
  {
    std::ofstream ofs(out_prefix + "_iters.txt");
    for(int v : iters) ofs << v << "\n";
  }
  {
    std::ofstream ofs(out_prefix + "_kf.txt");
    for(int v : kf_flags) ofs << v << "\n";
  }
  {
    std::ofstream ofs(out_prefix + "_time.txt");
    for(double v : times_ms) ofs << v << "\n";
  }

  return 0;
}
