// Native driver for the reference AlvaAR engine (original code, not from the
// reference). Feeds raw RGBA frames through the public System API exactly the
// way the JS layer does (ref src/system.js:173-199: one findCameraPose call
// per frame, pose read back as 16 f32), and writes one line per frame:
//   status p0 p1 ... p15 numTrackedPoints
// Pose layout is Utils::toPoseArray column-major (ref src/slam/src/utils.cpp:3-27).
//
// The reference ABI passes buffers as *int* heap offsets (wasm32 pointers, ref
// src/slam/src/system.hpp:34). To drive that unmodified on x86_64 we allocate
// the I/O buffers with mmap(MAP_32BIT) so their addresses fit in 31 bits and
// the int round-trip through reinterpret_cast is lossless.
//
// Usage:
//   alva_ref_runner w h fx fy cx cy k1 k2 p1 p2 frames.rgba out.txt [plane_out.txt]
#include <sys/mman.h>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <execinfo.h>
#include <csignal>
#include <opencv2/core/utility.hpp>
#include "system.hpp"

static void crash_handler(int sig)
{
    void* bt[64];
    int n = backtrace(bt, 64);
    fprintf(stderr, "FATAL signal %d, backtrace:\n", sig);
    backtrace_symbols_fd(bt, n, 2);
    _exit(3);
}

static void* low_alloc(size_t n)
{
    void* p = mmap(nullptr, n, PROT_READ | PROT_WRITE,
                   MAP_PRIVATE | MAP_ANONYMOUS | MAP_32BIT, -1, 0);
    if (p == MAP_FAILED || (uintptr_t)p > 0x7fffffffu)
    {
        fprintf(stderr, "low_alloc(%zu) failed\n", n);
        exit(2);
    }
    return p;
}

int main(int argc, char** argv)
{
    if (argc < 13)
    {
        fprintf(stderr,
                "usage: %s w h fx fy cx cy k1 k2 p1 p2 frames.rgba out.txt [plane_out.txt]\n",
                argv[0]);
        return 1;
    }
    const int w = atoi(argv[1]), h = atoi(argv[2]);
    const double fx = atof(argv[3]), fy = atof(argv[4]);
    const double cx = atof(argv[5]), cy = atof(argv[6]);
    const double k1 = atof(argv[7]), k2 = atof(argv[8]);
    const double p1 = atof(argv[9]), p2 = atof(argv[10]);
    const char* framesPath = argv[11];
    const char* outPath = argv[12];
    const char* planePath = argc > 13 ? argv[13] : nullptr;

    const size_t frameBytes = (size_t)w * h * 4;
    uint8_t* img = (uint8_t*)low_alloc(frameBytes);
    float* pose = (float*)low_alloc(16 * sizeof(float));
    float* planePose = (float*)low_alloc(16 * sizeof(float));

    signal(SIGSEGV, crash_handler);
    signal(SIGABRT, crash_handler);
    // match the WASM build's threading model: single-threaded OpenCV
    // (the reference's detector parallel_for_ mutates shared state and is
    // race-free only without a thread pool — SURVEY §5)
    cv::setNumThreads(0);

    System sys;
    sys.configure(w, h, fx, fy, cx, cy, k1, k2, p1, p2);

    FILE* in = fopen(framesPath, "rb");
    if (!in) { fprintf(stderr, "cannot open %s\n", framesPath); return 1; }
    FILE* out = fopen(outPath, "w");
    if (!out) { fprintf(stderr, "cannot open %s\n", outPath); return 1; }
    FILE* planeOut = planePath ? fopen(planePath, "w") : nullptr;

    int frameIdx = 0;
    while (fread(img, 1, frameBytes, in) == frameBytes)
    {
        memset(pose, 0, 16 * sizeof(float));
        int status = sys.findCameraPose((int)(uintptr_t)img, (int)(uintptr_t)pose);
        fprintf(out, "%d", status);
        for (int i = 0; i < 16; ++i)
            fprintf(out, " %.9g", pose[i]);
        fprintf(out, "\n");
        fflush(out);  // the engine can abort mid-sequence; keep lines durable

        if (planeOut && status == 1)
        {
            memset(planePose, 0, 16 * sizeof(float));
            int found = sys.findPlane((int)(uintptr_t)planePose, 250);
            fprintf(planeOut, "%d %d", frameIdx, found);
            for (int i = 0; i < 16; ++i)
                fprintf(planeOut, " %.9g", planePose[i]);
            fprintf(planeOut, "\n");
        }
        ++frameIdx;
    }
    fclose(in);
    fclose(out);
    if (planeOut) fclose(planeOut);
    fprintf(stderr, "processed %d frames\n", frameIdx);
    return 0;
}
