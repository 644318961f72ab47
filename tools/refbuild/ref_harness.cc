// Golden-generation harness against the rebuilt reference library.
//  v1 <img.pgm> <out.txt>      : brisk_v1 detect(70,3)+describe dump
//  scoremaps <img.pgm> <out>   : per-pixel cornerScore rasters for
//                                OAST9/16, AGAST5/8, 7/12s, 7/12d (b=0)
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <opencv2/core/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include <agast/agast5-8.h>
#include <agast/agast7-12d.h>
#include <agast/agast7-12s.h>
#include <agast/oast9-16.h>
#include <brisk/brisk-v1.h>

static uint32_t fbits(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  return u;
}

struct V1Det : brisk_v1::BriskFeatureDetector {
  V1Det(int t, int o) : brisk_v1::BriskFeatureDetector(t, o) {}
  void run(const cv::Mat& img, std::vector<cv::KeyPoint>& kps) {
    detectImpl(img, kps);
  }
};

static int run_v1(const char* imgpath, const char* outpath) {
  cv::Mat img = cv::imread(imgpath, cv::IMREAD_GRAYSCALE);
  if (img.empty()) { fprintf(stderr, "bad image %s\n", imgpath); return 1; }
  std::vector<cv::KeyPoint> kps;
  V1Det det(70, 3);
  det.run(img, kps);
  brisk_v1::BriskDescriptorExtractor ext(true, true, 1.0f);
  cv::Mat desc;
  ext.compute(img, kps, desc);
  FILE* f = fopen(outpath, "w");
  fprintf(f, "v1 %d %d kpts %zu descbytes %d\n", img.cols, img.rows,
          kps.size(), desc.cols);
  for (size_t i = 0; i < kps.size(); ++i) {
    const cv::KeyPoint& k = kps[i];
    fprintf(f, "%08x %08x %08x %08x %08x %d ", fbits(k.pt.x),
            fbits(k.pt.y), fbits(k.size), fbits(k.angle),
            fbits(k.response), k.octave);
    const uint8_t* d = desc.ptr<uint8_t>((int)i);
    for (int j = 0; j < desc.cols; ++j) fprintf(f, "%02x", d[j]);
    fprintf(f, "\n");
  }
  fclose(f);
  fprintf(stderr, "v1: %zu keypoints, %d desc bytes\n", kps.size(),
          desc.cols);
  return 0;
}

template <class DET>
static void score_raster(const cv::Mat& img, const char* path) {
  DET det;
  det.set_imageSize(img.cols, img.rows);
  det.set_threshold(0);
  int bw = det.get_borderWidth();
  std::vector<int32_t> out((size_t)img.rows * img.cols, -1);
  for (int y = bw; y < img.rows - bw; ++y)
    for (int x = bw; x < img.cols - bw; ++x)
      out[(size_t)y * img.cols + x] =
          det.cornerScore(img.ptr<uint8_t>(y) + x);
  FILE* f = fopen(path, "wb");
  int32_t hdr[3] = {img.rows, img.cols, bw};
  fwrite(hdr, 4, 3, f);
  fwrite(out.data(), 4, out.size(), f);
  fclose(f);
  fprintf(stderr, "%s: border %d\n", path, bw);
}

static int run_scoremaps(const char* imgpath, const char* prefix) {
  cv::Mat img = cv::imread(imgpath, cv::IMREAD_GRAYSCALE);
  if (img.empty()) { fprintf(stderr, "bad image %s\n", imgpath); return 1; }
  char p[512];
  snprintf(p, 512, "%s_oast9_16.bin", prefix);
  score_raster<agast::OastDetector9_16>(img, p);
  snprintf(p, 512, "%s_agast5_8.bin", prefix);
  score_raster<agast::AgastDetector5_8>(img, p);
  snprintf(p, 512, "%s_agast7_12s.bin", prefix);
  score_raster<agast::AgastDetector7_12s>(img, p);
  snprintf(p, 512, "%s_agast7_12d.bin", prefix);
  score_raster<agast::AgastDetector7_12d>(img, p);
  return 0;
}

int main(int argc, char** argv) {
  if (argc >= 4 && !strcmp(argv[1], "v1")) return run_v1(argv[2], argv[3]);
  if (argc >= 4 && !strcmp(argv[1], "scoremaps"))
    return run_scoremaps(argv[2], argv[3]);
  fprintf(stderr, "usage: %s v1|scoremaps <img> <out>\n", argv[0]);
  return 2;
}
