// Host-side native Othello engine.
//
// TPU-native counterpart of the reference's Cython extension
// (/root/reference/src/cython/bitboard.pyx -> bitboard.c): the hot on-device
// path is the JAX engine (ops/bitboard.py); this C++ library serves the
// host-side needs — interactive frontends, cross-implementation parity
// checks, and a CPU throughput baseline — through a small C ABI consumed via
// ctypes (ops/native.py).
//
// Algorithm: bit-parallel flood fills (Kogge-Stone style), the same design
// as the JAX engine and deliberately different from the reference's
// per-empty-square ray scans. Both rules variants are supported:
//   rules=0 "reference": post-shift masks exactly as the reference applies
//           them (reproducing its edge quirks — see ops/bitboard.py docs)
//   rules=1 "standard":  correct anti-wrap masks (standard Othello)

#include <cstdint>
#include <cstring>

namespace {

constexpr uint64_t FULL = 0xFFFFFFFFFFFFFFFFULL;
constexpr uint64_t FILE_A = 0x0101010101010101ULL;
constexpr uint64_t FILE_H = 0x8080808080808080ULL;
constexpr uint64_t NOT_A = FULL ^ FILE_A;
constexpr uint64_t NOT_H = FULL ^ FILE_H;

constexpr int SHIFTS[8] = {-8, 8, -1, 1, -9, -7, 7, 9};
// [rules][direction]
constexpr uint64_t MASKS[2][8] = {
    {FULL, FULL, NOT_A, NOT_H, NOT_A, NOT_H, NOT_A, NOT_H},  // reference
    {FULL, FULL, NOT_H, NOT_A, NOT_H, NOT_A, NOT_H, NOT_A},  // standard
};

inline uint64_t shift_by(uint64_t x, int d) {
  return d > 0 ? (x << d) : (x >> -d);
}

inline int popcount64(uint64_t x) { return __builtin_popcountll(x); }

// xorshift64* PRNG for playout benchmarks
inline uint64_t next_rand(uint64_t& s) {
  s ^= s >> 12;
  s ^= s << 25;
  s ^= s >> 27;
  return s * 0x2545F4914F6CDD1DULL;
}

}  // namespace

extern "C" {

uint64_t oth_legal(uint64_t me, uint64_t opp, int rules) {
  const uint64_t empty = ~(me | opp);
  uint64_t legal = 0;
  for (int i = 0; i < 8; ++i) {
    const int d = SHIFTS[i];
    const uint64_t m = MASKS[rules][i];
    const uint64_t prop = opp & m;
    uint64_t y = shift_by(me & m, -d) & prop;
    for (int k = 0; k < 6; ++k) y |= shift_by(y, -d) & prop;
    legal |= shift_by(y, -d) & empty;
  }
  return legal;
}

uint64_t oth_flips(uint64_t me, uint64_t opp, int pos, int rules) {
  if (pos < 0 || pos > 63) return 0;
  const uint64_t move = 1ULL << pos;
  if ((me | opp) & move) return 0;
  uint64_t total = 0;
  for (int i = 0; i < 8; ++i) {
    const int d = SHIFTS[i];
    const uint64_t m = MASKS[rules][i];
    const uint64_t prop = opp;
    uint64_t f = shift_by(move, d) & m & prop;
    for (int k = 0; k < 6; ++k) f |= shift_by(f, d) & m & prop;
    const uint64_t term = shift_by(f, d) & m & ~f;
    if (term & me) total |= f;
  }
  return total;
}

int oth_popcount(uint64_t x) { return popcount64(x); }

// Step in place: boards[0]=me, boards[1]=opp (side-to-move perspective,
// swapped on success). action: 0-63 square, 64 pass. Returns 1 on success.
int oth_step(uint64_t* boards, int action, int rules) {
  uint64_t me = boards[0], opp = boards[1];
  if (action == 64) {
    if (oth_legal(me, opp, rules) != 0) return 0;
    boards[0] = opp;
    boards[1] = me;
    return 1;
  }
  const uint64_t f = oth_flips(me, opp, action, rules);
  if (f == 0) return 0;
  const uint64_t placed = me | (1ULL << action) | f;
  boards[0] = opp & ~f;
  boards[1] = placed;
  return 1;
}

int oth_is_terminal(uint64_t me, uint64_t opp, int rules) {
  return oth_legal(me, opp, rules) == 0 && oth_legal(opp, me, rules) == 0;
}

// Random-vs-random playouts from the initial position; returns total moves
// played. Outcome tallies are from Black's perspective (Black = first mover).
long long oth_random_playouts(long long n_games, uint64_t seed, int rules,
                              long long* black_wins, long long* white_wins,
                              long long* draws) {
  long long total_moves = 0;
  long long bw = 0, ww = 0, dr = 0;
  uint64_t rng = seed ? seed : 0x9E3779B97F4A7C15ULL;
  for (long long g = 0; g < n_games; ++g) {
    uint64_t me = (1ULL << 28) | (1ULL << 35);   // black
    uint64_t opp = (1ULL << 27) | (1ULL << 36);  // white
    int ply = 0;
    for (;;) {
      const uint64_t legal = oth_legal(me, opp, rules);
      if (legal == 0) {
        if (oth_legal(opp, me, rules) == 0) break;  // terminal
        const uint64_t t = me;  // pass
        me = opp;
        opp = t;
        ++ply;
        ++total_moves;
        continue;
      }
      const int n = popcount64(legal);
      int k = static_cast<int>(next_rand(rng) % static_cast<uint64_t>(n));
      uint64_t bitset = legal;
      while (k--) bitset &= bitset - 1;  // drop k lowest set bits
      const int pos = __builtin_ctzll(bitset);
      const uint64_t f = oth_flips(me, opp, pos, rules);
      const uint64_t placed = me | (1ULL << pos) | f;
      const uint64_t new_me = opp & ~f;
      opp = placed;
      me = new_me;
      ++ply;
      ++total_moves;
    }
    const int me_n = popcount64(me), opp_n = popcount64(opp);
    // me = side to move at terminal; black iff ply even
    const int black_n = (ply % 2 == 0) ? me_n : opp_n;
    const int white_n = (ply % 2 == 0) ? opp_n : me_n;
    if (black_n > white_n)
      ++bw;
    else if (white_n > black_n)
      ++ww;
    else
      ++dr;
  }
  if (black_wins) *black_wins = bw;
  if (white_wins) *white_wins = ww;
  if (draws) *draws = dr;
  return total_moves;
}

}  // extern "C"
