// Native TUM RGB-D frame loader with threaded prefetch.
//
// TPU-native runtime counterpart of the reference's C++ dataset layer
// (/root/reference/src/tum_rgbd/io.cpp): the reference decodes images
// synchronously on the SLAM thread via cv::imread; here a worker pool
// decodes frames ahead of the consumer so host IO overlaps device compute.
//
// Exposed as a C ABI consumed through ctypes (io/native_loader.py):
//   oslam_loader_create(depth_paths, rgb_paths, n, n_threads, lookahead)
//   oslam_loader_get(handle, index, depth_out[h*w], rgb_out[h*w*3],
//                    &h, &w) -> 0 on success
//   oslam_loader_destroy(handle)
//
// Depth: 16-bit grayscale PNG (libpng). RGB: JPEG (libjpeg) or 8-bit PNG.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // u16 (depth) or u8x3 (rgb)
  int h = 0, w = 0, channels = 0;
  bool ok = false;
};

bool decode_png(const std::string& path, Image* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);
  int rowbytes = png_get_rowbytes(png, info);
  int ch = rowbytes / w / (depth == 16 ? 2 : 1);

  out->h = h;
  out->w = w;
  out->channels = (depth == 16) ? 1 : ch;
  out->data.resize((size_t)rowbytes * h);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; y++) rows[y] = out->data.data() + (size_t)y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  if (depth == 16) {
    // libpng emits big-endian 16-bit; swap to host little-endian
    uint8_t* p = out->data.data();
    for (size_t i = 0; i + 1 < out->data.size(); i += 2) std::swap(p[i], p[i + 1]);
  }
  out->ok = true;
  return true;
}

bool decode_jpeg(const std::string& path, Image* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->channels = 3;
  out->data.resize((size_t)out->h * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  out->ok = true;
  return true;
}

bool decode_any(const std::string& path, Image* out) {
  if (path.size() >= 4 &&
      (path.compare(path.size() - 4, 4, ".png") == 0 ||
       path.compare(path.size() - 4, 4, ".PNG") == 0))
    return decode_png(path, out);
  return decode_jpeg(path, out);
}

struct Frame {
  Image depth, rgb;
};

class Loader {
 public:
  Loader(std::vector<std::string> depth_paths,
         std::vector<std::string> rgb_paths, int n_threads, int lookahead)
      : depth_paths_(std::move(depth_paths)),
        rgb_paths_(std::move(rgb_paths)),
        lookahead_(lookahead),
        next_to_schedule_(0),
        consumer_pos_(0),
        stop_(false) {
    for (int i = 0; i < n_threads; i++)
      workers_.emplace_back([this] { Work(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocks until frame `idx` is decoded; returns it and advances the window.
  std::shared_ptr<Frame> Get(size_t idx) {
    std::unique_lock<std::mutex> lk(mu_);
    consumer_pos_ = idx;
    cv_work_.notify_all();
    cv_ready_.wait(lk, [&] { return ready_.count(idx) > 0 || stop_; });
    auto it = ready_.find(idx);
    if (it == ready_.end()) return nullptr;
    auto f = it->second;
    // drop frames at or before idx (sequential consumption)
    for (auto jt = ready_.begin(); jt != ready_.end();)
      jt = (jt->first <= idx) ? ready_.erase(jt) : ++jt;
    return f;
  }

 private:
  void Work() {
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [&] {
          return stop_ ||
                 (next_to_schedule_ < depth_paths_.size() &&
                  next_to_schedule_ < consumer_pos_ + (size_t)lookahead_);
        });
        if (stop_) return;
        idx = next_to_schedule_++;
        if (idx < consumer_pos_) idx = consumer_pos_;  // skip stale work
      }
      auto f = std::make_shared<Frame>();
      decode_any(depth_paths_[idx], &f->depth);
      if (idx < rgb_paths_.size() && !rgb_paths_[idx].empty())
        decode_any(rgb_paths_[idx], &f->rgb);
      {
        std::lock_guard<std::mutex> lk(mu_);
        ready_[idx] = f;
      }
      cv_ready_.notify_all();
    }
  }

  std::vector<std::string> depth_paths_, rgb_paths_;
  int lookahead_;
  size_t next_to_schedule_, consumer_pos_;
  bool stop_;
  std::map<size_t, std::shared_ptr<Frame>> ready_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_work_, cv_ready_;
};

}  // namespace

extern "C" {

void* oslam_loader_create(const char** depth_paths, const char** rgb_paths,
                          int n, int n_threads, int lookahead) {
  std::vector<std::string> dp(n), rp(n);
  for (int i = 0; i < n; i++) {
    dp[i] = depth_paths[i] ? depth_paths[i] : "";
    rp[i] = rgb_paths && rgb_paths[i] ? rgb_paths[i] : "";
  }
  return new Loader(std::move(dp), std::move(rp), n_threads, lookahead);
}

// depth_out: uint16 buffer of cap h*w; rgb_out: uint8 h*w*3 (nullable)
int oslam_loader_get(void* handle, int index, uint16_t* depth_out,
                     uint8_t* rgb_out, int* h, int* w) {
  auto* loader = static_cast<Loader*>(handle);
  auto f = loader->Get(index);
  if (!f || !f->depth.ok) return -1;
  *h = f->depth.h;
  *w = f->depth.w;
  if (f->depth.channels != 1) return -2;
  std::memcpy(depth_out, f->depth.data.data(),
              (size_t)f->depth.h * f->depth.w * 2);
  if (rgb_out && f->rgb.ok && f->rgb.channels == 3)
    std::memcpy(rgb_out, f->rgb.data.data(), (size_t)f->rgb.h * f->rgb.w * 3);
  return 0;
}

void oslam_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

// one-shot synchronous decodes (no prefetch)
int oslam_decode_depth(const char* path, uint16_t* out, int* h, int* w) {
  Image img;
  if (!decode_png(path, &img) || img.channels != 1) return -1;
  *h = img.h;
  *w = img.w;
  std::memcpy(out, img.data.data(), (size_t)img.h * img.w * 2);
  return 0;
}

int oslam_decode_rgb(const char* path, uint8_t* out, int* h, int* w) {
  Image img;
  if (!decode_any(path, &img) || img.channels != 3) return -1;
  *h = img.h;
  *w = img.w;
  std::memcpy(out, img.data.data(), (size_t)img.h * img.w * 3);
  return 0;
}
}
