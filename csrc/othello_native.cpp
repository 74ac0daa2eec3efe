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

// ---------------------------------------------------------------------------
// Alpha-beta search (the engine behind evaluation.players.NativeMinimaxPlayer
// — the strong classical baseline the reference intended EdaxPlayer to be,
// /root/reference/src/eval/players.py:226-262, never finished there).
//
// Negamax + alpha-beta with static-weight move ordering; midgame evaluation
// = mobility + positional square weights; exact disc-differential solve when
// the empty count drops to `exact_empties`.
// ---------------------------------------------------------------------------

namespace {

// classic positional weights: corners dominate, X/C squares poisoned
constexpr int SQ_W[64] = {
    100, -20, 10,  5,  5,  10, -20, 100,
    -20, -50, -2, -2, -2,  -2, -50, -20,
    10,  -2,  -1, -1, -1,  -1,  -2,  10,
    5,   -2,  -1, -1, -1,  -1,  -2,   5,
    5,   -2,  -1, -1, -1,  -1,  -2,   5,
    10,  -2,  -1, -1, -1,  -1,  -2,  10,
    -20, -50, -2, -2, -2,  -2, -50, -20,
    100, -20, 10,  5,  5,  10, -20, 100,
};

constexpr int WIN_BASE = 10000;  // terminal scores dominate any eval

inline int positional(uint64_t bb) {
  int s = 0;
  while (bb) {
    s += SQ_W[__builtin_ctzll(bb)];
    bb &= bb - 1;
  }
  return s;
}

inline int eval_mid(uint64_t me, uint64_t opp, int rules) {
  const int my_mob = popcount64(oth_legal(me, opp, rules));
  const int op_mob = popcount64(oth_legal(opp, me, rules));
  return 10 * (my_mob - op_mob) + positional(me) - positional(opp);
}

inline int terminal_score(uint64_t me, uint64_t opp) {
  const int d = popcount64(me) - popcount64(opp);
  if (d > 0) return WIN_BASE + d;
  if (d < 0) return -WIN_BASE + d;
  return 0;
}

// order moves by static square weight (descending insertion sort);
// `moves` must hold >= 34 ints (max Othello mobility is 33)
inline int gen_ordered_moves(uint64_t legal, int* moves) {
  int n = 0;
  for (uint64_t bb = legal; bb; bb &= bb - 1) {
    const int pos = __builtin_ctzll(bb);
    int j = n++;
    while (j > 0 && SQ_W[moves[j - 1]] < SQ_W[pos]) {
      moves[j] = moves[j - 1];
      --j;
    }
    moves[j] = pos;
  }
  return n;
}

// Negamax + alpha-beta. exact = true: evaluate only at terminal (endgame
// disc-differential solve); depth then only bounds pathological pass
// chains. When `best_pos` is non-null (the root call) the argmax action is
// reported through it (64 = pass) — root and interior nodes share this one
// routine so move ordering / pass / zero-flip handling cannot diverge.
int ab_search(uint64_t me, uint64_t opp, int depth, int alpha, int beta,
              int rules, bool exact, bool passed, int* best_pos = nullptr) {
  const uint64_t legal = oth_legal(me, opp, rules);
  if (legal == 0) {
    if (best_pos) *best_pos = 64;
    if (passed || oth_legal(opp, me, rules) == 0)
      return terminal_score(me, opp);
    return -ab_search(opp, me, depth, -beta, -alpha, rules, exact, true);
  }
  if (depth <= 0) return exact ? terminal_score(me, opp)
                               : eval_mid(me, opp, rules);

  int moves[34];
  const int n = gen_ordered_moves(legal, moves);
  int best = -2 * WIN_BASE;
  for (int i = 0; i < n; ++i) {
    const int pos = moves[i];
    const uint64_t f = oth_flips(me, opp, pos, rules);
    if (f == 0) continue;  // reference-rules quirk: legal mask can overreach
    const uint64_t placed = me | (1ULL << pos) | f;
    const int v = -ab_search(opp & ~f, placed, depth - 1, -beta, -alpha,
                             rules, exact, false);
    if (v > best) {
      best = v;
      if (best_pos) *best_pos = pos;
    }
    if (best > alpha) alpha = best;
    if (alpha >= beta) break;
  }
  if (best == -2 * WIN_BASE) {  // no move actually flips: treat as pass
    if (best_pos) *best_pos = 64;
    return passed ? terminal_score(me, opp)
                  : -ab_search(opp, me, depth, -beta, -alpha, rules, exact,
                               true);
  }
  return best;
}

}  // namespace

extern "C" {

// Best action for the side to move: 0-63, or 64 (pass) when no legal move.
// `depth` plies of midgame lookahead; when empties <= `exact_empties` the
// position is solved exactly by disc differential. `score_out` (optional)
// receives the negamax score of the chosen action — for a forced pass that
// is the score of the passed-to position negated, not 0.
int oth_best_move(uint64_t me, uint64_t opp, int depth, int exact_empties,
                  int rules, int* score_out) {
  const int empties = 64 - popcount64(me | opp);
  const bool exact = empties <= exact_empties;
  const int d = exact ? 2 * empties + 4 : (depth < 1 ? 1 : depth);
  int best_pos = 64;
  const int score = ab_search(me, opp, d, -2 * WIN_BASE, 2 * WIN_BASE,
                              rules, exact, false, &best_pos);
  if (score_out) *score_out = score;
  return best_pos;
}

}  // extern "C"
