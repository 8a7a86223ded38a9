"""Faithful NumPy re-expression of the reference ``textline_detect`` C++
program (6.4k LoC), the group stage of the pipeline (SURVEY.md §2
J1-J7, A4-A14, W1-W3, W5-W6, P8-P9; §3.1 step 4).

Pipeline order mirrors textline_detect/src/process.cpp:46-67:

    prepare_id_image -> make_lineblocker -> linefind -> search_loop
    (combine_chains fixpoint + fix_unbined + split_doubleline1-3 +
    chain_space) -> after_search (fix_shortchain, search_ruby,
    renumber_chain, number_unbind, make_block) -> space_check

Everything is page-local and deterministic: where the C++ relies on
incidental iteration order (unstable std::sort, flood-fill insertion
order), this port pins an explicit total order and documents the
canonicalization inline. Coordinates: boxes in pixels, raster maps in
heatmap cells (SCALE=4 px/cell), exactly like the reference binary
protocol (main.cpp:100-131).

Scale note: this runs inside ``applyInPandas(url)`` — one page per group,
pages never cross executors, so the stage is embarrassingly parallel and
its cost is O(page) regardless of corpus size.
"""

from __future__ import annotations

import math

import numpy as np

from ..config import (
    ALLOW_SIZEDIFF,
    ALLOWWIDTH_NEXT_BLOCK,
    EMPHASIS_CUTOFF,
    LINE_VALUETH,
    RUBY_CUTOFF,
    RUBYBASE_CUTOFF,
    SCALE,
    SEP_CLUSTERTH,
    SEP_VALUETH,
    SEP_VALUETH2,
    SPACE_CUTOFF,
    SUBTYPE_ALONE_RUBY,
    SUBTYPE_EMPHASIS,
    SUBTYPE_RUBY,
    SUBTYPE_RUBYBASE,
    SUBTYPE_SPACE,
    SUBTYPE_TAB_SPLIT,
    SUBTYPE_VERTICAL,
)

M_PI = math.pi
M_PI_4 = math.pi / 4
M_PI_2 = math.pi / 2
RUBY_BITS = SUBTYPE_RUBY  # 2+4; (subtype & 6) == 6 means ruby glyph


class Page:
    """Mutable per-page state: the charbox fields (line_detect.h:4-22) as
    parallel arrays plus the cell-grid raster maps the C++ keeps global."""

    def __init__(self, boxes: dict, line_runs: np.ndarray,
                 sep_runs: np.ndarray, sep_vals: np.ndarray):
        n = len(boxes["cx"])
        self.n = n
        self.cx = np.asarray(boxes["cx"], dtype=np.float64)
        self.cy = np.asarray(boxes["cy"], dtype=np.float64)
        self.w = np.asarray(boxes["w"], dtype=np.float64)
        self.h = np.asarray(boxes["h"], dtype=np.float64)
        # subtype init from code cutoffs (main.cpp:132-147): ruby sets BOTH
        # bits 2+4 on code1 alone; rubybase sets bit 2 on code2
        st = np.zeros(n, dtype=np.int64)
        st |= np.where(np.asarray(boxes["code2"]) > RUBYBASE_CUTOFF,
                       SUBTYPE_RUBYBASE, 0)
        st |= np.where(np.asarray(boxes["code1"]) > RUBY_CUTOFF, RUBY_BITS, 0)
        st |= np.where(np.asarray(boxes["code8"]) > SPACE_CUTOFF,
                       SUBTYPE_SPACE, 0)
        st |= np.where(np.asarray(boxes["code4"]) > EMPHASIS_CUTOFF,
                       SUBTYPE_EMPHASIS, 0)
        self.subtype = st
        self.direction = np.zeros(n, dtype=np.float64)
        self.double_line = np.zeros(n, dtype=np.int64)
        self.idx = np.full(n, -1, dtype=np.int64)
        self.subidx = np.full(n, -1, dtype=np.int64)
        self.block = np.full(n, -1, dtype=np.int64)
        self.page = np.zeros(n, dtype=np.int64)
        self.section = np.zeros(n, dtype=np.int64)

        # cell grid sized to cover all boxes and runs (the reference gets
        # width/height from the detect stage; extents are equivalent)
        max_x = max_y = 192
        if n:
            max_x = max(max_x, int(np.ceil((self.cx + self.w / 2).max() / SCALE)))
            max_y = max(max_y, int(np.ceil((self.cy + self.h / 2).max() / SCALE)))
        for runs in (line_runs, sep_runs):
            if len(runs):
                max_x = max(max_x, int(runs[:, 2].max()))
                max_y = max(max_y, int(runs[:, 0].max()))
        self.W = max_x + 4
        self.H = max_y + 4

        self.lineimage = np.zeros((self.H, self.W), dtype=np.float64)
        for y, x1, x2 in line_runs:
            self.lineimage[int(y), int(x1):int(x2) + 1] = 0.982
        self.sepimage = np.zeros((self.H, self.W), dtype=np.float64)
        for (y, x1, x2), v in zip(sep_runs, sep_vals):
            self.sepimage[int(y), int(x1):int(x2) + 1] = float(v)
        self.lineblocker = np.zeros((self.H, self.W), dtype=bool)

    def is_ruby(self, i: int) -> bool:
        return (self.subtype[i] & 6) == 6

    def size(self, i: int) -> float:
        return max(self.w[i], self.h[i])


def _runs_of_mask(mask: np.ndarray) -> list[tuple[int, int, int]]:
    """Row-major RLE of a boolean mask: (y, x1, x2) inclusive."""
    out = []
    for y in range(mask.shape[0]):
        row = mask[y]
        if not row.any():
            continue
        d = np.diff(row.astype(np.int8))
        starts = np.nonzero(d == 1)[0] + 1
        ends = np.nonzero(d == -1)[0]
        if row[0]:
            starts = np.concatenate([[0], starts])
        if row[-1]:
            ends = np.concatenate([ends, [len(row) - 1]])
        for s, e in zip(starts, ends):
            out.append((y, int(s), int(e)))
    return out


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


def _label_components_4(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-neighborhood connected components over a boolean mask, as
    run-length union-find (A11; search_connection prepare.cpp:6-66
    semantics — labels renumbered in row-major first-appearance order,
    which is exactly the scan order the C++ assigns cluster ids in).
    Returns (label map int[H,W] with -1 background, n_components)."""
    runs = _runs_of_mask(mask)
    n = len(runs)
    labels = np.full(mask.shape, -1, dtype=np.int64)
    if n == 0:
        return labels, 0
    uf = _UnionFind(n)
    # index runs by row for vertical adjacency
    row_runs: dict[int, list[int]] = {}
    for i, (y, _x1, _x2) in enumerate(runs):
        row_runs.setdefault(y, []).append(i)
    for i, (y, x1, x2) in enumerate(runs):
        for j in row_runs.get(y + 1, ()):
            jy, jx1, jx2 = runs[j]
            if jx1 > x2:
                break
            if jx2 >= x1:
                uf.union(i, j)
    remap: dict[int, int] = {}
    for i, (y, x1, x2) in enumerate(runs):
        r = uf.find(i)
        if r not in remap:
            remap[r] = len(remap)
        labels[y, x1:x2 + 1] = remap[r]
    return labels, len(remap)


# ---------------------------------------------------------------- prepare

def prepare_id_image(P: Page) -> tuple[np.ndarray, np.ndarray]:
    """Box-id rasters (prepare.cpp:68-97): idimage stamps every box,
    idimage_main skips ruby glyphs; later box ids overwrite earlier."""
    idimage = np.full((P.H, P.W), -1, dtype=np.int64)
    idimage_main = np.full((P.H, P.W), -1, dtype=np.int64)
    for i in range(P.n):
        left = int((P.cx[i] - P.w[i] / 2) / SCALE)
        right = int((P.cx[i] + P.w[i] / 2) / SCALE) + 1
        top = int((P.cy[i] - P.h[i] / 2) / SCALE)
        bottom = int((P.cy[i] + P.h[i] / 2) / SCALE) + 1
        if left < 0 or right >= P.W:
            continue
        if top < 0 or bottom >= P.H:
            continue
        if not P.is_ruby(i):
            idimage_main[top:bottom, left:right] = i
        idimage[top:bottom, left:right] = i
    return idimage, idimage_main


def make_lineblocker(P: Page) -> None:
    """Separator mask -> lineblocker (prepare.cpp:99-170):
    threshold at SEP_VALUETH, 4-CC, erase clusters with value-sum below
    SEP_CLUSTERTH (A12 cluster weight prune), then hysteresis-regrow each
    surviving cell to 8-neighbors above 0.1x its own value (A13)."""
    blocker = P.sepimage > SEP_VALUETH
    labels, n_comp = _label_components_4(blocker)
    if n_comp:
        weights = np.zeros(n_comp)
        on = labels >= 0
        np.add.at(weights, labels[on], P.sepimage[on])
        light = weights < SEP_CLUSTERTH
        blocker[on & light[np.clip(labels, 0, None)]] = False

    # hysteresis grow (prepare.cpp:135-169): seeds in row-major order,
    # 8-neighborhood stack walk down to 0.1 * seed value
    seeds = np.nonzero(blocker)
    sep = P.sepimage
    H, W = P.H, P.W
    for y0, x0 in zip(seeds[0].tolist(), seeds[1].tolist()):
        value_th = sep[y0, x0] * 0.1
        stack = [(y0, x0)]
        while stack:
            y, x = stack.pop()
            if sep[y, x] < value_th:
                continue
            blocker[y, x] = True
            for yy in range(y - 1, y + 2):
                for xx in range(x - 1, x + 2):
                    if xx < 0 or xx >= W or yy < 0 or yy >= H:
                        continue
                    if blocker[yy, xx]:
                        continue
                    if sep[yy, xx] < value_th:
                        continue
                    stack.append((yy, xx))
    P.lineblocker = blocker


# ---------------------------------------------------------------- linefind

def detect_line(P: Page) -> tuple[np.ndarray, int]:
    """Textline components (hough_linefind.cpp:200-255): flood fill with a
    5x5 neighborhood from cells in descending lineimage order, a blocker
    cell anywhere in the window stops expansion from that cell."""
    H, W = P.H, P.W
    lineid_map = np.full((H, W), -1, dtype=np.int64)
    on = np.nonzero(P.lineimage.ravel() >= LINE_VALUETH)[0]
    if len(on) == 0:
        return lineid_map, 0
    # descending value, index asc on ties (stable — canonicalizes the
    # unstable std::sort at hough_linefind.cpp:208)
    vals = P.lineimage.ravel()[on]
    order = on[np.argsort(-vals, kind="stable")]
    flat_line = P.lineimage.ravel()
    flat_block = P.lineblocker.ravel()
    flat_id = lineid_map.ravel()
    lineid_count = 0
    for i in order.tolist():
        if flat_id[i] >= 0:
            continue
        if flat_block[i]:
            continue
        stack = [i]
        while stack:
            i2 = stack.pop()
            if flat_id[i2] >= 0:
                continue
            if flat_block[i2]:
                continue
            if flat_line[i2] < LINE_VALUETH:
                continue
            flat_id[i2] = lineid_count
            x0 = i2 % W
            y0 = i2 // W
            tmp = []
            hit_blocker = False
            for y in range(y0 - 2, y0 + 3):
                for x in range(x0 - 2, x0 + 3):
                    if x < 0 or x >= W or y < 0 or y >= H:
                        continue
                    i3 = y * W + x
                    if flat_id[i3] >= 0:
                        continue
                    if flat_block[i3]:
                        hit_blocker = True
                        break
                    if flat_line[i3] < LINE_VALUETH:
                        continue
                    tmp.append(i3)
                if hit_blocker:
                    break
            if not hit_blocker:
                stack.extend(tmp)
        lineid_count += 1
    return lineid_map, lineid_count


def set_angle(P: Page, lineid_map: np.ndarray, lineid_count: int
              ) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-component orientation + angle (hough_linefind.cpp:257-334):
    taller-than-wide components take the top->bottom extreme-point angle,
    wider take left->right. Extreme-point ties are broken by (y, x)
    lexicographic order (canonicalizes the flood-fill-order dependence of
    the C++ p1/p2 scan)."""
    angle_map = np.full((P.H, P.W), np.nan)
    new_map = np.full((P.H, P.W), -1, dtype=np.int64)
    new_count = 0
    for lid in range(lineid_count):
        ys, xs = np.nonzero(lineid_map == lid)
        if len(ys) == 0:
            continue
        if xs.max() - xs.min() < ys.max() - ys.min():
            # vertical: topmost -> bottommost
            k1 = np.lexsort((xs, ys))[0]
            k2 = np.lexsort((xs, -ys))[0]
            angle = math.atan2(float(ys[k2] - ys[k1]), float(xs[k2] - xs[k1]))
        else:
            # horizontal: leftmost -> rightmost
            k1 = np.lexsort((ys, xs))[0]
            k2 = np.lexsort((ys, -xs))[0]
            angle = math.atan2(float(ys[k2] - ys[k1]), float(xs[k2] - xs[k1]))
        angle_map[ys, xs] = angle
        new_map[ys, xs] = new_count
        new_count += 1
    return angle_map, new_map, new_count


def chain_boxes(P: Page, lineid_count: int, angle_map: np.ndarray,
                lineid_map: np.ndarray) -> list[list[int]]:
    """J1 box<->line spatial join (chain_boxes hough_linefind.cpp:13-121):
    march outward from each non-ruby box center (left, right, up, down at
    each radius, scale-px steps) until a textline cell is hit; attach the
    box to that line and inherit its direction."""
    chains: list[list[int]] = [[] for _ in range(lineid_count)]
    H, W = P.H, P.W
    for boxid in range(P.n):
        if P.is_ruby(boxid):
            continue
        cx, cy = P.cx[boxid], P.cy[boxid]
        found = False
        for di in range(0, int(max(P.w[boxid], P.h[boxid]) / 2) + 1, SCALE):
            for xi, yi in ((cx - di, cy), (cx + di, cy),
                           (cx, cy - di), (cx, cy + di)):
                x, y = int(xi / SCALE), int(yi / SCALE)
                if not (0 <= x < W and 0 <= y < H):
                    continue
                lineid = lineid_map[y, x]
                direction = angle_map[y, x]
                if lineid >= 0 and not math.isnan(direction):
                    chains[lineid].append(boxid)
                    P.direction[boxid] = direction
                    found = True
                    break
            if found:
                break
    return chains


def line_grow(P: Page, lineid_count: int, angle_map: np.ndarray,
              lineid_map: np.ndarray, chains: list[list[int]]) -> np.ndarray:
    """Thicken each line by its chained boxes' max size so a second
    chain_boxes pass catches boxes the thin skeleton missed
    (line_grow hough_linefind.cpp:123-198). Horizontal lines grow upward
    by max height; vertical grow sideways by max width/2."""
    line_width = np.zeros(lineid_count)
    for lid in range(lineid_count):
        mw = 0.0
        for boxid in chains[lid]:
            if abs(P.direction[boxid]) < M_PI_4:
                mw = max(mw, P.h[boxid])
            else:
                mw = max(mw, P.w[boxid], P.h[boxid])
        line_width[lid] = mw / SCALE
    H, W = P.H, P.W
    map2 = np.full((H, W), -1, dtype=np.int64)
    ys, xs = np.nonzero(lineid_map >= 0)
    for y, x in zip(ys.tolist(), xs.tolist()):
        if P.lineblocker[y, x]:
            continue
        lid = lineid_map[y, x]
        map2[y, x] = lid
        direction = angle_map[y, x]
        mw = int(line_width[lid])
        if abs(direction) < M_PI_4:
            for y2 in range(y, max(-1, y - mw - 1), -1):
                if P.lineblocker[y2, x]:
                    break
                if map2[y2, x] < 0:
                    map2[y2, x] = lid
                    angle_map[y2, x] = direction
        else:
            for x2 in range(x, max(-1, x - mw // 2 - 1), -1):
                if P.lineblocker[y, x2]:
                    break
                if map2[y, x2] < 0:
                    map2[y, x2] = lid
                    angle_map[y, x2] = direction
            for x2 in range(x, min(W, x + mw // 2 + 1)):
                if P.lineblocker[y, x2]:
                    break
                if map2[y, x2] < 0:
                    map2[y, x2] = lid
                    angle_map[y, x2] = direction
    return map2


def linefind(P: Page) -> list[list[int]]:
    """Detect textline components, attach boxes, grow, re-attach
    (linefind hough_linefind.cpp:336-355)."""
    lineid_map, count = detect_line(P)
    angle_map, lineid_map, count = set_angle(P, lineid_map, count)
    chains = chain_boxes(P, count, angle_map, lineid_map)
    lineid_map = line_grow(P, count, angle_map, lineid_map, chains)
    chains = chain_boxes(P, count, angle_map, lineid_map)
    fix_chain_info(P, chains)
    return chains


# ---------------------------------------------------------------- chains

def sort_chain(chain: list[int], P: Page) -> None:
    """W1 in-chain reading sort (sort_chain search_loop.cpp:12-65): sort by
    the line axis; runs of boxes overlapping the group head's span re-sort
    by the cross axis (e.g. stacked punctuation in horizontal text)."""
    if not chain:
        return
    if abs(P.direction[chain[0]]) < M_PI_4:
        chain.sort(key=lambda a: (P.cx[a], a))
        i = 0
        while i < len(chain):
            j = i + 1
            while j < len(chain) and \
                    P.cx[chain[i]] + P.w[chain[i]] / 2 > P.cx[chain[j]]:
                j += 1
            if j - i > 1:
                chain[i:j] = sorted(chain[i:j], key=lambda a: (P.cy[a], a))
            i = j
    else:
        chain.sort(key=lambda a: (P.cy[a], a))
        i = 0
        while i < len(chain):
            j = i + 1
            while j < len(chain) and \
                    P.cy[chain[i]] + P.h[chain[i]] / 2 > P.cy[chain[j]]:
                j += 1
            if j - i > 1:
                chain[i:j] = sorted(chain[i:j], key=lambda a: (P.cx[a], a))
            i = j


def fix_chain_info(P: Page, chains: list[list[int]]) -> None:
    """P9 degenerate-chain drop (<2 boxes) + per-chain reading sort
    (fix_chain_info search_loop.cpp:67-85). Dropped boxes become unbound
    and are re-attached by fix_unbined / number_unbind."""
    chains[:] = [c for c in chains if len(c) >= 2]
    for chain in chains:
        sort_chain(chain, P)


def search_chain(P: Page, chain: list[int]):
    """A5 weighted endpoint anchors (search_chain search_loop.cpp:87-177):
    start/end transverse anchor = positional-decay weighted mean of the
    non-ruby, non-warichu boxes; direction re-derived from the anchors."""
    nonruby = [i for i in chain
               if not P.is_ruby(i) and P.double_line[i] == 0]
    if not nonruby:
        return 0.0, 0.0, 0.0, -1.0, -1.0, -1.0, -1.0
    w = max(P.w[i] for i in nonruby)
    h = max(P.h[i] for i in nonruby)
    direction = P.direction[nonruby[0]]
    n = len(nonruby)
    if abs(direction) < M_PI_4:
        wt1 = np.array([P.w[i] * P.h[i] / (k + 1) for k, i in enumerate(nonruby)])
        wt2 = np.array([P.w[i] * P.h[i] / (n - k) for k, i in enumerate(nonruby)])
        cys = np.array([P.cy[i] for i in nonruby])
        start_cy = float((cys * wt1).sum() / wt1.sum())
        end_cy = float((cys * wt2).sum() / wt2.sum())
        start_cx = float(P.cx[nonruby[0]])
        end_cx = float(P.cx[nonruby[-1]])
        direction = math.atan2(end_cy - start_cy, end_cx - start_cx)
        if direction > M_PI_2:
            direction -= M_PI
    else:
        wt1 = np.array([P.w[i] * P.h[i] / (k + 1) for k, i in enumerate(nonruby)])
        wt2 = np.array([P.w[i] * P.h[i] / (n - k) for k, i in enumerate(nonruby)])
        cxs = np.array([P.cx[i] for i in nonruby])
        start_cx = float((cxs * wt1).sum() / wt1.sum())
        end_cx = float((cxs * wt2).sum() / wt2.sum())
        start_cy = float(P.cy[nonruby[0]])
        end_cy = float(P.cy[nonruby[-1]])
        direction = math.atan2(end_cy - start_cy, end_cx - start_cx)
    return direction, w, h, start_cx, start_cy, end_cx, end_cy


def find_linecenter_id(P: Page, chains: list[list[int]], chainid: int):
    """Boxes tracking the line center (find_linecenter_id
    search_loop.cpp:180-236): big-enough non-ruby boxes within half a
    line-size of the center fit line."""
    direction, w, h, s_cx, s_cy, e_cx, e_cy = search_chain(P, chains[chainid])
    sel: list[int] = []
    cand = [i for i in chains[chainid]
            if not P.is_ruby(i) and P.double_line[i] == 0
            and (max(P.w[i], P.h[i]) / max(w, h) >= 0.4 if max(w, h) > 0 else False)]
    if not cand:
        return sel, direction, w, h, s_cx, s_cy, e_cx, e_cy
    center_x = sum(P.cx[i] for i in cand) / len(cand)
    center_y = sum(P.cy[i] for i in cand) / len(cand)
    if abs(direction) < M_PI_4:
        for i in cand:
            yi = math.tan(direction) * (P.cx[i] - center_x) + center_y
            if abs(yi - P.cy[i]) < max(w, h) / 2:
                sel.append(i)
    else:
        for i in cand:
            xi = math.tan(M_PI_2 - direction) * (P.cy[i] - center_y) + center_x
            if abs(xi - P.cx[i]) < max(w, h) / 2:
                sel.append(i)
    return sel, direction, w, h, s_cx, s_cy, e_cx, e_cy


def make_track_line(P: Page, chains: list[list[int]], chainid: int,
                    extra_len: int = 0):
    """Center track polyline of a chain, sampled every SCALE px
    (make_track_line search_loop.cpp:239-449). Returns (xs, ys, direction,
    w, h) in pixel coords; extra_len extends past both ends (ruby probe)."""
    sel, direction, w, h, s_cx, s_cy, e_cx, e_cy = \
        find_linecenter_id(P, chains, chainid)
    xs: list[int] = []
    ys: list[int] = []
    if abs(direction) < M_PI_4:
        xi: list[float] = []
        yi: list[float] = []
        if sel:
            j = sel[0]
            track = P.cy[j]
            xi.append(P.cx[j] - P.w[j] / 2)
            yi.append(track)
        else:
            return xs, ys, direction, w, h
        for boxid in chains[chainid]:
            if P.is_ruby(boxid):
                continue
            if boxid in sel:
                track = (track + P.cy[boxid]) / 2
            xi.append(P.cx[boxid])
            yi.append(track)
        j = sel[-1]
        track = P.cy[j]
        xi.append(P.cx[j] + P.w[j] / 2)
        yi.append(track)

        if extra_len > 0 and len(xi) >= 2:
            x1, y1, x2, y2 = xi[0], yi[0], xi[1], yi[1]
            a = (y2 - y1) / (x2 - x1) if x2 != x1 else 0.0
            head_x: list[int] = []
            head_y: list[int] = []
            xp = int(x1)
            while xp > x1 - extra_len * w * 2:
                yp = int((xp - x1) * a + y1)
                xp1, yp1 = xp // SCALE, yp // SCALE
                if 0 <= xp1 < P.W and 0 <= yp1 < P.H:
                    if P.lineblocker[yp1, xp1]:
                        break
                    head_x.append(xp)
                    head_y.append(yp)
                xp -= SCALE
            xs.extend(reversed(head_x))
            ys.extend(reversed(head_y))

        for k in range(len(xi) - 1):
            x1, y1, x2, y2 = xi[k], yi[k], xi[k + 1], yi[k + 1]
            if x2 == x1:
                continue
            a = (y2 - y1) / (x2 - x1)
            xp = int(x1)
            while xp < x2:
                xs.append(xp)
                ys.append(int((xp - x1) * a + y1))
                xp += SCALE

        if extra_len > 0 and len(xi) >= 2:
            x1, y1 = xi[-2], yi[-2]
            x2, y2 = xi[-1], yi[-1]
            a = (y2 - y1) / (x2 - x1) if x2 != x1 else 0.0
            xp = int(x2)
            while xp < x2 + extra_len * w * 2:
                yp = int((xp - x1) * a + y1)
                xp1, yp1 = xp // SCALE, yp // SCALE
                if 0 <= xp1 < P.W and 0 <= yp1 < P.H:
                    if P.lineblocker[yp1, xp1]:
                        break
                    xs.append(xp)
                    ys.append(yp)
                xp += SCALE
    else:
        xi = []
        yi = []
        if sel:
            j = sel[0]
            track = P.cx[j]
            xi.append(track)
            yi.append(P.cy[j] - P.h[j] / 2)
        else:
            return xs, ys, direction, w, h
        for boxid in chains[chainid]:
            if P.is_ruby(boxid):
                continue
            if boxid in sel:
                track = (track + P.cx[boxid]) / 2
            xi.append(track)
            yi.append(P.cy[boxid])
        j = sel[-1]
        track = P.cx[j]
        xi.append(track)
        yi.append(P.cy[j] + P.h[j] / 2)

        if extra_len > 0 and len(yi) >= 2:
            x1, y1, x2, y2 = xi[0], yi[0], xi[1], yi[1]
            a = (x2 - x1) / (y2 - y1) if y2 != y1 else 0.0
            head_x = []
            head_y = []
            yp = int(y1)
            while yp > y1 - extra_len * h * 2:
                xp = int((yp - y1) * a + x1)
                xp1, yp1 = xp // SCALE, yp // SCALE
                if 0 <= xp1 < P.W and 0 <= yp1 < P.H:
                    if P.lineblocker[yp1, xp1]:
                        break
                    head_x.append(xp)
                    head_y.append(yp)
                yp -= SCALE
            xs.extend(reversed(head_x))
            ys.extend(reversed(head_y))

        for k in range(len(yi) - 1):
            x1, y1, x2, y2 = xi[k], yi[k], xi[k + 1], yi[k + 1]
            if y2 == y1:
                continue
            a = (x2 - x1) / (y2 - y1)
            yp = int(y1)
            while yp < y2:
                xs.append(int((yp - y1) * a + x1))
                ys.append(yp)
                yp += SCALE

        if extra_len > 0 and len(yi) >= 2:
            x1, y1 = xi[-2], yi[-2]
            x2, y2 = xi[-1], yi[-1]
            a = (x2 - x1) / (y2 - y1) if y2 != y1 else 0.0
            yp = int(y2)
            while yp < y2 + extra_len * h * 2:
                xp = int((yp - y1) * a + x1)
                xp1, yp1 = xp // SCALE, yp // SCALE
                if 0 <= xp1 < P.W and 0 <= yp1 < P.H:
                    if P.lineblocker[yp1, xp1]:
                        break
                    xs.append(xp)
                    ys.append(yp)
                yp += SCALE
    return xs, ys, direction, w, h


def create_chainid_map(P: Page, chains: list[list[int]], ratio: float = 1.0,
                       extra_len: int = 0) -> np.ndarray:
    """Chain-id raster: the spatial index that turns every probe join into
    an O(1) lookup (create_chainid_map search_loop.cpp:451-522). Track
    lines are stamped with a transverse band of size/3*ratio, then each
    chained non-ruby box's rectangle is stamped."""
    cmap = np.full((P.H, P.W), -1, dtype=np.int64)
    for chainid, chain in enumerate(chains):
        if not chain:
            continue
        xs, ys, direction, w, h = make_track_line(P, chains, chainid,
                                                  extra_len)
        s_s = max(w, h)
        band = int(s_s / 3 / SCALE * ratio)
        if abs(direction) < M_PI_4:
            for xp, yp in zip(xs, ys):
                xi, yi = xp // SCALE, yp // SCALE
                if not (0 <= xi < P.W and 0 <= yi < P.H):
                    continue
                lo = max(0, yi - band)
                hi = min(P.H, yi + band)
                col = cmap[lo:hi, xi]
                col[col < 0] = chainid
        else:
            for xp, yp in zip(xs, ys):
                xi, yi = xp // SCALE, yp // SCALE
                if not (0 <= xi < P.W and 0 <= yi < P.H):
                    continue
                lo = max(0, xi - band)
                hi = min(P.W, xi + band)
                row = cmap[yi, lo:hi]
                row[row < 0] = chainid
    for chainid, chain in enumerate(chains):
        for boxid in chain:
            if P.is_ruby(boxid):
                continue
            left = int((P.cx[boxid] - P.w[boxid] / 2) / SCALE)
            right = int((P.cx[boxid] + P.w[boxid] / 2) / SCALE)
            top = int((P.cy[boxid] - P.h[boxid] / 2) / SCALE)
            bottom = int((P.cy[boxid] + P.h[boxid] / 2) / SCALE)
            left, right = max(0, left), min(P.W, right)
            top, bottom = max(0, top), min(P.H, bottom)
            if left >= right or top >= bottom:
                continue
            view = cmap[top:bottom, left:right]
            view[view < 0] = chainid
    return cmap
