// Test-only oracle: open a KMC database with the REFERENCE kmc_api
// (compiled from /root/reference/KMC/kmc_api at test time, never vendored)
// and dump or probe it, so tests can prove our io/kmc.py reader/writers
// interoperate with the real format implementation.
//
// Usage:
//   kmc_oracle <db_prefix> list          -> "KMER\tCOUNT" per line (sorted
//                                           by listing order)
//   kmc_oracle <db_prefix> check         -> read k-mer strings on stdin,
//                                           print count (or -1) per line
#include <cstdio>
#include <iostream>
#include <string>

#include "kmc_api/kmc_file.h"

int main(int argc, char** argv) {
  if (argc != 3) {
    std::cerr << "usage: kmc_oracle <db_prefix> list|check\n";
    return 2;
  }
  std::string prefix = argv[1];
  std::string mode = argv[2];
  CKMCFile db;
  if (mode == "list") {
    if (!db.OpenForListing(prefix)) {
      std::cerr << "OpenForListing failed\n";
      return 1;
    }
    CKMCFileInfo info;
    db.Info(info);
    CKmerAPI kmer(info.kmer_length);
    uint32 count;
    std::string s;
    while (db.ReadNextKmer(kmer, count)) {
      kmer.to_string(s);
      std::cout << s << "\t" << count << "\n";
    }
    return 0;
  }
  if (mode == "check") {
    if (!db.OpenForRA(prefix)) {
      std::cerr << "OpenForRA failed\n";
      return 1;
    }
    CKMCFileInfo info;
    db.Info(info);
    CKmerAPI kmer(info.kmer_length);
    std::string line;
    while (std::getline(std::cin, line)) {
      if (line.empty()) continue;
      uint32 count = 0;
      if (!kmer.from_string(line)) {
        std::cout << "-2\n";
        continue;
      }
      if (db.CheckKmer(kmer, count))
        std::cout << count << "\n";
      else
        std::cout << "-1\n";
    }
    return 0;
  }
  std::cerr << "unknown mode\n";
  return 2;
}
