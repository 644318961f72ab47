// Minimal glog stand-in for the reference rebuild (assert-based, same
// semantics as the reference's own agast/glog.h shim).
#pragma once
#include <cassert>
#include <iostream>
#ifndef CHECK
#define CAST_TO_USED(x) static_cast<void>(x)
#define CHECK_NOTNULL(x) assert((x) != nullptr); CAST_TO_USED(x);
#define CHECK_EQ(x, y) assert((x) == (y)); std::cout << ""
#define CHECK_NE(x, y) assert((x) != (y)); std::cout << ""
#define CHECK_GT(x, y) assert((x) > (y)); std::cout << ""
#define CHECK_LT(x, y) assert((x) < (y)); std::cout << ""
#define CHECK_GE(x, y) assert((x) >= (y)); std::cout << ""
#define CHECK_LE(x, y) assert((x) <= (y)); std::cout << ""
#define CHECK(x) assert(x); std::cout << ""
#define LOG(x) std::cout
#endif
