"""Generalized exact-cover solver for t13's untrusted region:
row 14, row 15, column 15 (46 cells), trusted block x<=13 & y<=14.
"""
import sys
from heapq import heappush, heappushpop

MAXD = 19


def solve(L, HB, pinned, min_len=11, max_len=18, keep=40,
          max_sols=None, extra_invariant=None):
    trusted = {}
    for x in range(14):
        for y in range(15):
            trusted[(x, y)] = (L[x][y], HB[x][y])
    free_cells = ([(14, y) for y in range(16)]
                  + [(15, y) for y in range(16)]
                  + [(x, 15) for x in range(14)])
    recall = {c: (L[c[0]][c[1]], HB[c[0]][c[1]]) for c in free_cells}

    # leaf space minus trusted minus pinned
    covered = []
    for l, c in trusted.values():
        covered.append((c << (MAXD - l), (c + 1) << (MAXD - l)))
    for cell, (l, c) in pinned.items():
        covered.append((c << (MAXD - l), (c + 1) << (MAXD - l)))
    covered.sort()
    gaps, p = [], 0
    for a, b in covered:
        if a > p:
            gaps.append((p, a))
        if b <= p:
            raise ValueError(f"overlap at {a:#x}..{b:#x}")
        p = b
    if p < (1 << MAXD):
        gaps.append((p, 1 << MAXD))

    unassigned = [c for c in free_cells if c not in pinned]
    n_cells = len(unassigned)

    # line structures: for monotonicity, build per-line dict of
    # already-known (linepos -> (len, code)) from pinned cells
    def line_of(cell):
        x, y = cell
        lines = []
        if x in (14, 15):
            lines.append((("r", x), y))
        if y == 15:
            lines.append((("c", 15), x))
        return lines

    known_line = {}
    for cell, (l, c) in pinned.items():
        for key, lp in line_of(cell):
            known_line.setdefault(key, []).append((lp, l, c))

    def mono_ok(cell, l, c, assign):
        """same-length codes strictly decreasing along each line the
        cell belongs to, against pinned + assigned."""
        for key, lp in line_of(cell):
            for lp2, l2, c2 in known_line.get(key, ()):
                if l2 == l:
                    if (lp < lp2) != (c > c2) or c == c2:
                        return False
            for cell2, (l2, c2) in assign.items():
                for key2, lp2 in line_of(cell2):
                    if key2 == key and l2 == l:
                        if (lp < lp2) != (c > c2) or c == c2:
                            return False
        return True

    def sym_ok(cell, l, assign):
        x, y = cell
        m = (y, x)
        if m == cell:
            return True
        mv = trusted.get(m) or pinned.get(m) or assign.get(m)
        if mv is None:
            return True
        return abs(mv[0] - l) <= 1

    best = []
    counter = [0]
    sols = [0]
    max_mass = 1 << (MAXD - min_len)

    def cell_score(cell, l, c):
        rl, rc = recall[cell]
        s = 0
        if rc == c:
            s += 2
        if rl == l:
            s += 1
        if (rl, rc) == (l, c):
            s += 2
        return s

    assign = {}

    def dfs(gi, pos, score, n_done):
        if max_sols and sols[0] >= max_sols:
            return
        if gi == len(gaps):
            if n_done == n_cells:
                sols[0] += 1
                counter[0] += 1
                item = (score, counter[0], dict(assign))
                if len(best) < keep:
                    heappush(best, item)
                else:
                    heappushpop(best, item)
            return
        a, b = gaps[gi]
        if pos == b:
            nxt = gaps[gi + 1][0] if gi + 1 < len(gaps) else 0
            dfs(gi + 1, nxt, score, n_done)
            return
        rem = (b - pos) + sum(bb - aa for aa, bb in gaps[gi + 1:])
        rem_cells = n_cells - n_done
        if rem_cells > rem or rem > rem_cells * max_mass:
            return
        if best and len(best) == keep and score + 5 * rem_cells <= best[0][0]:
            return
        for l in range(min_len, max_len + 1):
            step = 1 << (MAXD - l)
            if pos % step or pos + step > b:
                continue
            code = pos >> (MAXD - l)
            for cell in unassigned:
                if cell in assign:
                    continue
                if not sym_ok(cell, l, assign):
                    continue
                if not mono_ok(cell, l, code, assign):
                    continue
                if extra_invariant and not extra_invariant(
                    cell, l, code, assign
                ):
                    continue
                assign[cell] = (l, code)
                dfs(gi, pos + step, score + cell_score(cell, l, code),
                    n_done + 1)
                del assign[cell]
        return

    dfs(0, gaps[0][0], 0, 0)
    return sorted(best, reverse=True), sols[0], unassigned
