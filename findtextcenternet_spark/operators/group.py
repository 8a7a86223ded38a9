"""Group stage (SURVEY.md §2 J1-J7, A4-A14, W1-W3, P8-P9; §3.1 step 4).

A brand-new NumPy re-expression of the reference's 6.4k-LoC C++
``textline_detect`` program (textline_detect/src/process.cpp:46-67 pipeline
order): connected components over the textline raster, box→line spatial
attach, ruby re-homing, line→block grouping with separator rejection, block
reading order, and dense renumbering — everything page-local, so it runs as
one ``applyInPandas(url)`` group.

Scale note: connected components here are run-length union-find (not pixel
flood fill) — O(runs α(runs)) per page, and pages never cross executors, so
the stage scales linearly with page count regardless of cluster size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import (
    EMPHASIS_CUTOFF,
    RUBY_CUTOFF,
    RUBYBASE_CUTOFF,
    SCALE,
    SPACE_CUTOFF,
    SUBTYPE_EMPHASIS,
    SUBTYPE_RUBY,
    SUBTYPE_RUBYBASE,
    SUBTYPE_SPACE,
    SUBTYPE_VERTICAL,
)


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, a: int) -> int:
        p = self.parent
        while p[a] != a:
            p[a] = p[p[a]]
            a = p[a]
        return a

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def run_connected_components(runs: pd.DataFrame) -> np.ndarray:
    """A11 as run-length union-find: merge horizontally-overlapping runs on
    adjacent rows (4-neighborhood CC, prepare.cpp:6-66 semantics)."""
    n = len(runs)
    uf = _UnionFind(n)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    order = np.lexsort((runs["x1"].to_numpy(), runs["y"].to_numpy()))
    y = runs["y"].to_numpy()[order]
    x1 = runs["x1"].to_numpy()[order]
    x2 = runs["x2"].to_numpy()[order]
    row_start: dict[int, int] = {}
    for i in range(n):
        row_start.setdefault(int(y[i]), i)
    for i in range(n):
        ry = int(y[i])
        j = row_start.get(ry + 1)
        while j is not None and j < n and y[j] == ry + 1:
            if x1[j] > x2[i]:
                break
            if x2[j] >= x1[i]:
                uf.union(order[i], order[j])
            j += 1
    # also merge touching runs on the same row (defensive)
    for i in range(n - 1):
        if y[i] == y[i + 1] and x1[i + 1] <= x2[i] + 1:
            uf.union(order[i], order[i + 1])
    roots = np.array([uf.find(i) for i in range(n)], dtype=np.int64)
    # dense renumber (A14) in first-appearance order of the sorted runs
    remap: dict[int, int] = {}
    comp = np.zeros(n, dtype=np.int64)
    for i in range(n):
        r = int(roots[order[i]])
        if r not in remap:
            remap[r] = len(remap)
        comp[order[i]] = remap[r]
    return comp


def _march_to_component(cell_map: dict[tuple[int, int], int], ccy: int,
                        ccx: int, radius: int,
                        prefer: str = "xy") -> int:
    """J1: march outward from the box center until a textline-component
    cell is hit (hough_linefind.cpp:13-121 semantics, cell-grid steps)."""
    hit = cell_map.get((ccy, ccx))
    if hit is not None:
        return hit
    for r in range(1, radius + 1):
        if prefer == "down":
            probes = ((ccy + r, ccx), (ccy, ccx - r), (ccy, ccx + r), (ccy - r, ccx))
        elif prefer == "left":
            probes = ((ccy, ccx - r), (ccy + r, ccx), (ccy - r, ccx), (ccy, ccx + r))
        else:
            probes = ((ccy, ccx - r), (ccy, ccx + r), (ccy - r, ccx), (ccy + r, ccx))
        for pr in probes:
            hit = cell_map.get(pr)
            if hit is not None:
                return hit
    return -1


def group_page(boxes: pd.DataFrame, runs: pd.DataFrame) -> pd.DataFrame:
    """Order one page's boxes into (block, idx, subidx, subtype).

    Returns the input columns plus block/idx/subidx/subtype/vertical, sorted
    in final reading order (W2: block, idx, subidx)."""
    out_cols = ["box_id", "p", "cx", "cy", "w", "h", "feature",
                "block", "idx", "subidx", "subtype"]
    if boxes.empty:
        return pd.DataFrame(columns=out_cols)

    line_runs = runs[runs["channel"] == "line"].reset_index(drop=True)
    sep_runs = runs[runs["channel"] == "sep"].reset_index(drop=True)

    comp = run_connected_components(line_runs)
    n_comp = int(comp.max()) + 1 if len(comp) else 0

    # component geometry (A4/A8 analogues)
    comp_x1 = np.full(n_comp, np.inf)
    comp_x2 = np.full(n_comp, -np.inf)
    comp_y1 = np.full(n_comp, np.inf)
    comp_y2 = np.full(n_comp, -np.inf)
    cell_map: dict[tuple[int, int], int] = {}
    lr_y = line_runs["y"].to_numpy()
    lr_x1 = line_runs["x1"].to_numpy()
    lr_x2 = line_runs["x2"].to_numpy()
    for i in range(len(line_runs)):
        c = int(comp[i])
        y = int(lr_y[i])
        x1, x2 = int(lr_x1[i]), int(lr_x2[i])
        comp_y1[c] = min(comp_y1[c], y)
        comp_y2[c] = max(comp_y2[c], y)
        comp_x1[c] = min(comp_x1[c], x1)
        comp_x2[c] = max(comp_x2[c], x2)
        for x in range(x1, x2 + 1):
            cell_map[(y, x)] = c
    comp_vertical = (comp_y2 - comp_y1) > (comp_x2 - comp_x1)

    # P8 flag thresholding (main.cpp:132-147 cutoffs)
    b = boxes.reset_index(drop=True)
    # column arrays once — pandas scalar .iloc in the per-box loops was the
    # kernel's hot spot (O(boxes) dispatch overhead per page)
    box_id_a = b["box_id"].to_numpy()
    p_a = b["p"].to_numpy()
    cx_a = b["cx"].to_numpy()
    cy_a = b["cy"].to_numpy()
    w_a = b["w"].to_numpy()
    h_a = b["h"].to_numpy()
    feat_l = b["feature"].tolist()
    is_ruby = (b["code1"].to_numpy() > RUBY_CUTOFF) & (b["code2"].to_numpy() > RUBYBASE_CUTOFF)
    is_rubybase = ~is_ruby & (b["code2"].to_numpy() > RUBYBASE_CUTOFF)
    is_space = b["code8"].to_numpy() > SPACE_CUTOFF
    is_emphasis = b["code4"].to_numpy() > EMPHASIS_CUTOFF

    ccx = np.rint(b["cx"].to_numpy() / SCALE).astype(np.int64)
    ccy = np.rint(b["cy"].to_numpy() / SCALE).astype(np.int64)
    radius = (np.maximum(b["w"].to_numpy(), b["h"].to_numpy()) / SCALE).astype(np.int64) + 3

    line_of = np.full(len(b), -1, dtype=np.int64)
    for i in range(len(b)):
        if is_ruby[i]:
            # J4: ruby boxes probe toward the base line (below for
            # horizontal, left for vertical — ruby_search.cpp:12-108)
            r = int(2.5 * h_a[i] / SCALE) + 3
            line_of[i] = _march_to_component(cell_map, int(ccy[i]), int(ccx[i]),
                                             r, prefer="down")
            if line_of[i] >= 0 and comp_vertical[line_of[i]]:
                pass
            elif line_of[i] < 0:
                line_of[i] = _march_to_component(cell_map, int(ccy[i]),
                                                 int(ccx[i]), r, prefer="left")
        else:
            line_of[i] = _march_to_component(cell_map, int(ccy[i]), int(ccx[i]),
                                             int(radius[i]), prefer="xy")

    # J3: unbound boxes attach to the nearest component center (fix_unbined)
    if (line_of < 0).any() and n_comp > 0:
        ccx_f = (comp_x1 + comp_x2) / 2.0
        ccy_f = (comp_y1 + comp_y2) / 2.0
        for i in np.nonzero(line_of < 0)[0]:
            d2 = (ccx_f - ccx[i]) ** 2 + (ccy_f - ccy[i]) ** 2
            line_of[i] = int(np.argmin(d2))
    elif n_comp == 0:
        line_of[:] = 0
        comp_vertical = np.array([False])
        comp_x1 = np.array([float(ccx.min())])
        comp_x2 = np.array([float(ccx.max())])
        comp_y1 = np.array([float(ccy.min())])
        comp_y2 = np.array([float(ccy.max())])
        n_comp = 1

    # per-line emission order (W1 in-chain sort + ruby interleave)
    used_comps = sorted(set(int(c) for c in line_of))
    line_emit: dict[int, list[int]] = {}
    for c in used_comps:
        idxs = np.nonzero(line_of == c)[0]
        vert = bool(comp_vertical[c])
        axis = cy_a if vert else cx_a
        main = sorted((i for i in idxs if not is_ruby[i]),
                      key=lambda i: (axis[i], int(box_id_a[i])))
        rubys = sorted((i for i in idxs if is_ruby[i]),
                       key=lambda i: (axis[i], int(box_id_a[i])))
        emit: list[int] = []
        ri = 0
        k = 0
        while k < len(main):
            i = main[k]
            emit.append(i)
            if is_rubybase[i]:
                # find end of this rubybase run
                j = k
                while j + 1 < len(main) and is_rubybase[main[j + 1]]:
                    j += 1
                run_end_ax = axis[main[j]] + (w_a[main[j]]
                                              if not vert else h_a[main[j]]) / 2
                emit.extend(main[k + 1:j + 1])
                # its ruby glyphs: all not-yet-emitted ruby up to run end
                while ri < len(rubys) and axis[rubys[ri]] <= run_end_ax + SCALE:
                    emit.append(rubys[ri])
                    ri += 1
                k = j + 1
            else:
                k += 1
        emit.extend(rubys[ri:])  # leftovers, deterministic tail
        line_emit[c] = emit

    # line → block grouping (J6/J7) per orientation
    med_size = float(np.median(h_a)) if not b.empty else 32.0
    gap_thresh = 3.5 * med_size / SCALE

    sep_intervals = list(zip(sep_runs["y"].astype(int),
                             sep_runs["x1"].astype(int),
                             sep_runs["x2"].astype(int)))

    def sep_between(c1: int, c2: int) -> bool:
        lo = min(comp_y2[c1], comp_y2[c2])
        hi = max(comp_y1[c1], comp_y1[c2])
        for sy, sx1, sx2 in sep_intervals:
            if lo < sy < hi and sx1 <= comp_x2[c1] and sx2 >= comp_x1[c1]:
                return True
        return False

    horiz = [c for c in used_comps if not comp_vertical[c]]
    vert = [c for c in used_comps if comp_vertical[c]]

    blocks: list[list[int]] = []  # each: ordered comp list
    if horiz:
        horiz.sort(key=lambda c: ((comp_y1[c] + comp_y2[c]) / 2.0, comp_x1[c]))
        cur = [horiz[0]]
        for c_prev, c in zip(horiz, horiz[1:]):
            gap = (comp_y1[c] + comp_y2[c]) / 2.0 - (comp_y1[c_prev] + comp_y2[c_prev]) / 2.0
            x_overlap = min(comp_x2[c_prev], comp_x2[c]) - max(comp_x1[c_prev], comp_x1[c])
            if gap <= gap_thresh and x_overlap > 0 and not sep_between(c_prev, c):
                cur.append(c)
            else:
                blocks.append(cur)
                cur = [c]
        blocks.append(cur)
    if vert:
        vert.sort(key=lambda c: (-(comp_x1[c] + comp_x2[c]) / 2.0, comp_y1[c]))
        cur = [vert[0]]
        for c_prev, c in zip(vert, vert[1:]):
            gap = (comp_x1[c_prev] + comp_x2[c_prev]) / 2.0 - (comp_x1[c] + comp_x2[c]) / 2.0
            y_overlap = min(comp_y2[c_prev], comp_y2[c]) - max(comp_y1[c_prev], comp_y1[c])
            if gap <= gap_thresh and y_overlap > 0:
                cur.append(c)
            else:
                blocks.append(cur)
                cur = [c]
        blocks.append(cur)

    # W3 block reading order + A9 orientation vote
    def block_key(comps: list[int]):
        y1 = min(comp_y1[c] for c in comps)
        x1 = min(comp_x1[c] for c in comps)
        x2 = max(comp_x2[c] for c in comps)
        if comp_vertical[comps[0]]:
            return (0, -x2, y1)
        return (0, y1, x1)

    area_vote = 0.0
    for comps in blocks:
        a = sum((comp_x2[c] - comp_x1[c] + 1) * (comp_y2[c] - comp_y1[c] + 1)
                for c in comps)
        area_vote += a if not comp_vertical[comps[0]] else -a
    # page orientation decides which family sorts first (make_block.cpp:1543-1553)
    blocks.sort(key=lambda comps: (0 if (comp_vertical[comps[0]] == (area_vote < 0)) else 1,) + block_key(comps)[1:])

    rows = []
    for bi, comps in enumerate(blocks):
        for li, c in enumerate(comps):
            vert_flag = bool(comp_vertical[c])
            for si, i in enumerate(line_emit.get(c, [])):
                subtype = 0
                if vert_flag:
                    subtype |= SUBTYPE_VERTICAL
                if is_ruby[i]:
                    subtype |= SUBTYPE_RUBY
                elif is_rubybase[i]:
                    subtype |= SUBTYPE_RUBYBASE
                if is_space[i]:
                    subtype |= SUBTYPE_SPACE
                if is_emphasis[i]:
                    subtype |= SUBTYPE_EMPHASIS
                rows.append((
                    int(box_id_a[i]), float(p_a[i]),
                    float(cx_a[i]), float(cy_a[i]),
                    float(w_a[i]), float(h_a[i]),
                    feat_l[i],
                    bi, li, si, subtype,
                ))
    return pd.DataFrame(rows, columns=out_cols)
