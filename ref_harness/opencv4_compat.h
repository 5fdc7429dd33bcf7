// Force-included when compiling the reference sources against OpenCV 4.x:
// the 2016-era code uses pre-4.0 constants/headers that OpenCV 4 moved into
// the *_c.h compatibility headers.
#pragma once
#include <cstdint>
#include <opencv2/core.hpp>
#include <opencv2/core/types_c.h>
#include <opencv2/imgproc.hpp>
#include <opencv2/imgproc/types_c.h>
