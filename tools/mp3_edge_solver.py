"""Exact solver for the last row+column of a 16x16 B.7 table whose
inner 15x15 block validates clean.

Enumerates ALL ways to (a) tile the uncovered leaf space with 31
aligned subtrees of depth min_len..max_len and (b) assign them to the
31 edge cells, under the invariants every validated table exhibits:
  - same-length hcod strictly decreasing along row 15 (left->right),
  - same-length hcod strictly decreasing along column 15 (top->down),
  - |hlen(x,15) - hlen(15,x)| <= 1 (near-symmetry of mirror cells).
Solutions are scored by agreement with the recalled matrices.
"""
import sys
from heapq import heappush, heappushpop

MAXD_DEFAULT = 13


def solve_edges(L, HB, min_len, max_len, keep=40, max_sols=None,
                fixed=None):
    MAXD = max_len
    trusted = [(L[x][y], HB[x][y]) for x in range(15) for y in range(15)]
    covered = []
    for l, c in trusted:
        covered.append((c << (MAXD - l), (c + 1) << (MAXD - l)))
    covered.sort()
    gaps, p = [], 0
    for a, b in covered:
        if a > p:
            gaps.append((p, a))
        p = max(p, b)
    if p < (1 << MAXD):
        gaps.append((p, 1 << MAXD))

    # cells: (line, linepos, cellid). line 0 = column 15 (linepos=x),
    # line 1 = row 15 (linepos=y).
    cells = [("c", x, (x, 15)) for x in range(15)] + \
            [("r", y, (15, y)) for y in range(16)]
    recall = {cid: (L[cid[0]][cid[1]], HB[cid[0]][cid[1]])
              for _, _, cid in cells}
    mirror = {}
    for x in range(16):
        for y in range(16):
            if (x, y) != (y, x):
                mirror[(x, y)] = (y, x)

    fixed = fixed or {}
    n_cells = len(cells)
    # leaf-space sweep positions
    gap_list = gaps
    total_mass = sum(b - a for a, b in gaps)

    best = []          # heap of (score, counter, assignment)
    counter = [0]
    sols_found = [0]

    # state: assignment dict cid -> (len, code)
    # last same-(line,len) linepos: key (line, l) -> linepos
    assign = {}
    lastpos = {}

    max_cell_mass = 1 << (MAXD - min_len)

    def cell_score(cid, l, c):
        rl, rc = recall[cid]
        s = 0
        if rc == c:
            s += 2
        if rl == l:
            s += 1
        if (rl, rc) == (l, c):
            s += 2
        return s

    def dfs(gi, pos, score, n_assigned):
        if max_sols and sols_found[0] >= max_sols:
            return
        if gi == len(gap_list):
            if n_assigned == n_cells:
                sols_found[0] += 1
                counter[0] += 1
                item = (score, counter[0], dict(assign))
                if len(best) < keep:
                    heappush(best, item)
                else:
                    heappushpop(best, item)
            return
        a, b = gap_list[gi]
        if pos == b:
            dfs(gi + 1, gap_list[gi + 1][0] if gi + 1 < len(gap_list)
                else 0, score, n_assigned)
            return
        # bound: remaining cells vs remaining mass
        rem_mass = (b - pos) + sum(bb - aa for aa, bb in gap_list[gi+1:])
        rem_cells = n_cells - n_assigned
        if rem_cells > rem_mass or rem_mass > rem_cells * max_cell_mass:
            return
        # bound on score
        if best and len(best) == keep and score + 5 * rem_cells <= best[0][0]:
            return
        for l in range(min_len, max_len + 1):
            step = 1 << (MAXD - l)
            if pos % step or pos + step > b:
                continue
            code = pos >> (MAXD - l)
            # choose a cell for (l, code)
            for line, lp, cid in cells:
                if cid in assign:
                    continue
                fx = fixed.get(cid)
                if fx is not None and fx != (l, code):
                    continue
                key = (line, l)
                lim = lastpos.get(key)
                if lim is not None and lp >= lim:
                    continue
                mcid = mirror.get(cid)
                if mcid in assign and abs(assign[mcid][0] - l) > 1:
                    continue
                # assign
                assign[cid] = (l, code)
                old = lastpos.get(key)
                lastpos[key] = lp
                dfs(gi, pos + step, score + cell_score(cid, l, code),
                    n_assigned + 1)
                del assign[cid]
                if old is None:
                    del lastpos[key]
                else:
                    lastpos[key] = old
        return

    dfs(0, gap_list[0][0], 0, 0)
    return sorted(best, reverse=True), sols_found[0], total_mass
