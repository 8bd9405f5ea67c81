"""Round-14 fresh sitting for ISO 11172-3 Table B.7 Huffman table 13
(the last unshipped B.7 table; see tools/mp3_table_workbench.py
round13_t13_notes for the prior state: trusted block clean, 39/46
edge cells forced, 7-cell deep corner tied 4486 ways).

This file records the ROUND-14 fresh transcription (hlen + hcod,
entered this sitting without consulting the round-13 matrices, which
were never committed) and the machinery to cross-check it against the
committed round-13 record:

  1. the trusted block (x<=13, y<=14) must validate standalone AND
     its uncovered leaf space must reproduce the 30-hole list printed
     verbatim in round13_t13_notes() — a 210-cell double-entry check;
  2. the 7 committed anchors ((14,0)=13/48 (14,1)=12/23 (14,3)=13/39
     (15,3)=14/27 (15,6)=15/29 (0,15)=13/19 (7,15)=16/42) must match;
  3. the 46 edge cells are then solved against the holes, admitting
     only the misread classes the validated t15/t16/t24 solves
     established (same value one level shallower/deeper; value
     doubling = reading a node as its own left descendant).

Round-14 corner hypothesis (what this sitting tests): the round-13
tie was an artifact of treating |hlen(x,y)-hlen(y,x)|<=1 as a HARD
constraint in tools/mp3_t13_solver.py.  The fresh corner recall
(14,13)=17/1 (14,14)=16/4 (14,15)=16/2 (15,12)=19/1 (15,13)=18/1
(15,14)=19/0 (15,15)=16/1 tiles holes 16/{0,1,2,4} EXACTLY and
VERBATIM (16/0 = 19/0 + 19/1 + 18/1 + 17/1, a perfect ladder), and
the leftover hole 17/23 disappears if (10,15) — recalled 17/22 in
BOTH sittings — is truly its parent 16/11, the recall being the
left-descendant misread that closed t16's corner (node recalled as
its own left child: 11<<1 = 22 at len+1).  Under that single repair
column 15's len-16 codes read 42 > 11 > 2 > 1, strictly decreasing.
The corner symmetry violations ((15,12)=19 vs (12,15)=16 etc.) are
accepted: the symmetry heuristic was demoted in round 13 (t10
double-entry) and t13 is the one B.7 table with 19-bit codes, whose
only possible home is this corner (mass equation: no other cell in
the table has length > 18).
"""
from fractions import Fraction
import sys

sys.path.insert(0, "/root/repo")
from tools.mp3_table_workbench import validate, style_check  # noqa: E402

# --- Round-14 fresh transcription (this sitting) -------------------
# hlen[x][y]
T13L = [
    [1, 4, 6, 7, 8, 9, 9, 10, 9, 10, 11, 11, 12, 12, 13, 13],
    [3, 4, 6, 7, 8, 8, 9, 9, 9, 9, 10, 10, 11, 12, 12, 12],
    [6, 6, 7, 8, 9, 9, 10, 10, 9, 10, 10, 11, 11, 12, 13, 13],
    [7, 7, 8, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 13],
    [8, 7, 9, 9, 10, 10, 11, 11, 10, 11, 11, 12, 12, 13, 13, 14],
    [9, 8, 9, 10, 10, 10, 11, 11, 11, 11, 12, 11, 13, 13, 14, 14],
    [9, 9, 10, 10, 11, 11, 11, 11, 11, 12, 12, 12, 13, 13, 14, 14],
    [10, 9, 10, 11, 11, 11, 12, 12, 12, 12, 13, 13, 13, 14, 16, 16],
    [9, 8, 9, 10, 10, 11, 11, 12, 12, 12, 12, 13, 13, 14, 15, 15],
    [10, 9, 10, 10, 11, 11, 11, 13, 12, 13, 13, 14, 14, 14, 16, 15],
    [10, 10, 10, 11, 11, 12, 12, 13, 12, 13, 14, 13, 14, 15, 16, 17],
    [11, 10, 10, 11, 12, 12, 12, 12, 13, 13, 13, 14, 15, 15, 15, 16],
    [11, 11, 11, 12, 12, 13, 12, 13, 14, 14, 15, 15, 15, 16, 16, 16],
    [12, 11, 12, 13, 13, 13, 14, 14, 14, 14, 14, 15, 16, 15, 16, 16],
    [13, 12, 12, 13, 13, 13, 15, 14, 14, 17, 15, 15, 15, 17, 16, 16],
    [12, 12, 13, 14, 14, 14, 15, 14, 15, 15, 16, 16, 19, 18, 19, 16],
]
# hcod[x][y]
T13HB = [
    [1, 5, 14, 21, 34, 51, 46, 71, 42, 52, 68, 52, 67, 44, 43, 19],
    [3, 4, 12, 19, 31, 26, 44, 33, 31, 24, 32, 24, 31, 35, 22, 14],
    [15, 13, 23, 36, 59, 49, 77, 65, 29, 40, 30, 40, 27, 33, 42, 16],
    [22, 20, 37, 61, 56, 79, 73, 64, 43, 76, 56, 37, 26, 31, 25, 14],
    [35, 16, 60, 57, 97, 75, 114, 91, 54, 73, 55, 41, 48, 53, 23, 24],
    [58, 27, 50, 96, 76, 70, 93, 84, 77, 58, 79, 29, 74, 49, 41, 17],
    [47, 45, 78, 74, 115, 94, 90, 79, 69, 83, 71, 50, 59, 38, 36, 15],
    [72, 34, 56, 95, 92, 85, 91, 90, 86, 73, 77, 65, 51, 44, 43, 42],
    [43, 20, 30, 44, 55, 78, 72, 87, 78, 61, 46, 54, 37, 30, 20, 16],
    [53, 25, 41, 37, 44, 59, 54, 81, 66, 76, 57, 54, 37, 18, 39, 11],
    [35, 33, 31, 57, 42, 82, 72, 80, 47, 58, 55, 21, 22, 26, 38, 22],
    [53, 25, 23, 38, 70, 60, 51, 36, 55, 26, 34, 23, 27, 14, 9, 7],
    [34, 32, 28, 39, 49, 75, 30, 52, 48, 40, 52, 28, 18, 17, 9, 5],
    [45, 21, 34, 64, 56, 50, 49, 45, 31, 19, 12, 15, 10, 7, 6, 3],
    [48, 23, 20, 39, 36, 35, 53, 21, 16, 23, 13, 10, 6, 1, 4, 2],
    [16, 15, 17, 27, 25, 20, 29, 11, 17, 12, 16, 8, 1, 1, 0, 1],
]

# The 30 holes committed at the end of round 13 (round13_t13_notes),
# i.e. the uncovered leaf runs of ROUND-13's trusted block — the
# double-entry target for this sitting's trusted block.
R13_HOLES = [
    (14, 0), (15, 2), (16, 7), (16, 8), (16, 11), (15, 6), (16, 16),
    (14, 5), (14, 6), (14, 8), (16, 42), (14, 11), (15, 29), (14, 15),
    (13, 8), (13, 10), (13, 12), (15, 53), (14, 27), (13, 14),
    (12, 8), (13, 19), (11, 7), (12, 16), (13, 35), (13, 36),
    (13, 39), (12, 20), (12, 23), (13, 48),
]

R13_ANCHORS = {
    (14, 0): (13, 48), (14, 1): (12, 23), (14, 3): (13, 39),
    (15, 3): (14, 27), (15, 6): (15, 29), (0, 15): (13, 19),
    (7, 15): (16, 42),
}

MAXD = 19


def codes_of(cells):
    return {(T13L[x][y], T13HB[x][y]): (x, y) for x, y in cells}


def leaf_span(l, c):
    return (c << (MAXD - l), (c + 1) << (MAXD - l))


def holes_of(cells):
    """Maximal aligned uncovered subtrees left by `cells`."""
    spans = sorted(leaf_span(T13L[x][y], T13HB[x][y]) for x, y in cells)
    runs, p = [], 0
    for a, b in spans:
        if a > p:
            runs.append((p, a))
        if a < p:
            raise ValueError(f"overlap at {a}..{b}")
        p = b
    if p < (1 << MAXD):
        runs.append((p, 1 << MAXD))
    # decompose runs into maximal aligned subtrees
    out = []
    for a, b in runs:
        while a < b:
            size = a & -a or (1 << MAXD)
            while a + size > b:
                size >>= 1
            l = MAXD - size.bit_length() + 1
            out.append((l, a >> (MAXD - l)))
            a += size
    return out


def main():
    trusted = [(x, y) for x in range(14) for y in range(15)]
    tcodes = codes_of(trusted)
    # 1. prefix-freeness of the fresh trusted block
    items = sorted(tcodes.items())
    conflicts = []
    for i, ((l1, c1), xy1) in enumerate(items):
        for (l2, c2), xy2 in items[i + 1:]:
            if (l2, c2) == (l1, c1):
                conflicts.append(("dup", xy1, xy2))
            elif l2 > l1 and (c2 >> (l2 - l1)) == c1:
                conflicts.append(("prefix", xy1, xy2))
    print(f"trusted block: {len(tcodes)} codes, "
          f"{len(conflicts)} conflicts")
    for c in conflicts[:10]:
        print("  ", c)
    if conflicts:
        return
    # 2. hole list vs the committed round-13 record
    holes = holes_of(trusted)
    mass = sum(1 << (MAXD - l) for l, _ in holes)
    print(f"holes: {len(holes)}, deficit {mass} leaf-19 units")
    s14, s13 = set(holes), set(R13_HOLES)
    print(f"  match round-13 record: {s14 == s13}")
    for h in sorted(s13 - s14):
        print(f"  r13 only: {h}")
    for h in sorted(s14 - s13):
        print(f"  r14 only: {h}")
    # 3. anchors
    for (x, y), (l, c) in sorted(R13_ANCHORS.items()):
        got = (T13L[x][y], T13HB[x][y])
        print(f"  anchor ({x},{y}): r13 {l}/{c}  r14 {got[0]}/{got[1]}"
              f"  {'AGREE' if got == (l, c) else 'DISAGREE'}")
    # 4. full table as transcribed
    full = codes_of([(x, y) for x in range(16) for y in range(16)])
    print(f"full fresh table: {len(full)}/256 distinct codes")
    validate("t13 fresh (verbatim)", full, 16, 16)


if __name__ == "__main__":
    main()
