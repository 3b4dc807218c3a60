// Host-side frame ring buffer + pixel preprocessing (native runtime).
//
// TPU-native counterpart of the reference's JS<->WASM frame ABI: the
// SharedMemory heap manager (reference src/system.js:1-43,63-67) plus the
// per-frame RGBA->GRAY conversion the C++ engine performs on the raw heap
// pointer (reference src/slam/src/system.cpp:111-112 cv::cvtColor).
//
// The ring holds `capacity` grayscale float32 frames.  Producers push raw
// RGBA/gray bytes (camera, decoder); the converter runs here in native
// code (auto-vectorized BT.601) so Python never touches pixels; consumers
// map slots zero-copy as numpy arrays and ship them straight to the device.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this build).

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>

extern "C" {

struct FrameRing {
    int width;
    int height;
    int capacity;
    std::atomic<long long> head;   // next slot to write (monotonic)
    std::atomic<long long> tail;   // next slot to read  (monotonic)
    float* data;                   // capacity * width * height floats
    double* timestamps;            // capacity
};

FrameRing* fr_create(int width, int height, int capacity) {
    if (width <= 0 || height <= 0 || capacity <= 0) return nullptr;
    auto* r = new (std::nothrow) FrameRing();
    if (!r) return nullptr;
    r->width = width;
    r->height = height;
    r->capacity = capacity;
    r->head.store(0);
    r->tail.store(0);
    size_t n = static_cast<size_t>(width) * height * capacity;
    r->data = static_cast<float*>(std::malloc(n * sizeof(float)));
    r->timestamps = static_cast<double*>(std::malloc(capacity * sizeof(double)));
    if (!r->data || !r->timestamps) {
        std::free(r->data);
        std::free(r->timestamps);
        delete r;
        return nullptr;
    }
    return r;
}

void fr_destroy(FrameRing* r) {
    if (!r) return;
    std::free(r->data);
    std::free(r->timestamps);
    delete r;
}

int fr_capacity(const FrameRing* r) { return r ? r->capacity : 0; }

long long fr_count(const FrameRing* r) {
    return r ? (r->head.load() - r->tail.load()) : 0;
}

static inline float* slot_ptr(FrameRing* r, long long seq) {
    size_t frame = static_cast<size_t>(r->width) * r->height;
    return r->data + (seq % r->capacity) * frame;
}

// Push an RGBA8 frame; converts to grayscale float32 (BT.601, 0..255 —
// matching cv::cvtColor COLOR_RGBA2GRAY).  Returns the sequence number,
// or -1 when the ring is full.
long long fr_push_rgba(FrameRing* r, const uint8_t* rgba, double timestamp) {
    if (!r || !rgba) return -1;
    long long head = r->head.load(std::memory_order_relaxed);
    if (head - r->tail.load(std::memory_order_acquire) >= r->capacity)
        return -1;
    float* dst = slot_ptr(r, head);
    const int n = r->width * r->height;
    // auto-vectorizable: fixed-point BT.601 in float
    for (int i = 0; i < n; ++i) {
        const uint8_t* p = rgba + 4 * i;
        dst[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
    }
    r->timestamps[head % r->capacity] = timestamp;
    r->head.store(head + 1, std::memory_order_release);
    return head;
}

// Push an already-gray uint8 frame (widened to float32).
long long fr_push_gray_u8(FrameRing* r, const uint8_t* gray, double timestamp) {
    if (!r || !gray) return -1;
    long long head = r->head.load(std::memory_order_relaxed);
    if (head - r->tail.load(std::memory_order_acquire) >= r->capacity)
        return -1;
    float* dst = slot_ptr(r, head);
    const int n = r->width * r->height;
    for (int i = 0; i < n; ++i) dst[i] = static_cast<float>(gray[i]);
    r->timestamps[head % r->capacity] = timestamp;
    r->head.store(head + 1, std::memory_order_release);
    return head;
}

// Pointer to the oldest unconsumed frame (zero-copy mapping for numpy),
// or null if empty.  The slot stays valid until fr_release.
float* fr_front(FrameRing* r, double* timestamp_out) {
    if (!r) return nullptr;
    long long tail = r->tail.load(std::memory_order_relaxed);
    if (r->head.load(std::memory_order_acquire) <= tail) return nullptr;
    if (timestamp_out) *timestamp_out = r->timestamps[tail % r->capacity];
    return slot_ptr(r, tail);
}

// Release the oldest frame (after the consumer uploaded it).
int fr_release(FrameRing* r) {
    if (!r) return 0;
    long long tail = r->tail.load(std::memory_order_relaxed);
    if (r->head.load(std::memory_order_acquire) <= tail) return 0;
    r->tail.store(tail + 1, std::memory_order_release);
    return 1;
}

}  // extern "C"
