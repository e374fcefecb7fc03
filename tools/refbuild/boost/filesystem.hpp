// std::filesystem shim standing in for boost::filesystem, used ONLY to
// compile the UNMODIFIED reference matcher (/root/reference/matching) as an
// honest CPU-baseline binary for benchmarking. The reference uses
// fs::path / fs::directory_iterator, which std::filesystem provides with
// compatible surface under C++17.
#pragma once
#include <filesystem>
namespace boost { namespace filesystem {
using namespace std::filesystem;
}}
