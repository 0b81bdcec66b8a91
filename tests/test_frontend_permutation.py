"""Unit tests for `transition_circuit.permutation()` against a brute-force
cycle model (round-4 verdict item: the +1-shift / swap-pair construction had
no independent check).

The permutation argument asserts that the multiset {(id(x), w(x))} equals
{(perm(x), w(x))}: cells in the same cycle of perm∘id^{-1} must carry equal
witness values.  The semantic spec (`transition_circuit.rs:120-151`) is that
those cycles are exactly the pairs {(next_col, row), (cur_col, row+1)} per
state cell, every other cell a fixed point, with both mappings +1-shifted so
no cell index is ever 0 (`circuit.rs:35-52` zero-padding soundness trap).
"""

from __future__ import annotations

from quill_tpu.frontend.transition_circuit import TransitionCircuit
from quill_tpu.piops.virtual_poly import Const


def _build(num_rows=8, n_state=2, n_plain=1):
    c = TransitionCircuit.new(num_rows)
    cells = [c.allocate_state_cell() for _ in range(n_state)]
    for _ in range(n_plain):
        c.allocate_witness_cell()
    # constraints irrelevant to permutation(), but keep the circuit legal
    c.enforce_boundary_constraint(0, cells[0].current.to_expr() - Const(0))
    return c, cells


def _classes_from_mapping(id_map, perm_map):
    """Union-find equivalence classes induced by the (id, perm) pair.
    Both are +1-shifted cell indices; entry i says cell i pairs with cell
    perm_map[i]-1."""
    n = len(id_map)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        parent[find(a)] = find(b)

    for i in range(n):
        assert id_map[i] == i + 1, "id mapping must be the +1-shifted iota"
        union(i, perm_map[i] - 1)
    groups = {}
    for i in range(n):
        groups.setdefault(find(i), set()).add(i)
    return {frozenset(g) for g in groups.values()}


def _expected_classes(circuit):
    rows = circuit.num_rows()
    cells = rows * circuit.num_cols()
    classes = {frozenset([i]) for i in range(cells)}
    for cell in circuit.state_cells:
        for row in range(rows - 1):
            frm = cell.next.col * rows + row
            to = cell.current.col * rows + (row + 1)
            classes.discard(frozenset([frm]))
            classes.discard(frozenset([to]))
            classes.add(frozenset([frm, to]))
    return classes


def test_permutation_is_bijection_without_zero():
    c, _ = _build()
    id_map, perm_map = c.permutation()
    n = c.num_rows() * c.num_cols()
    assert len(id_map) == len(perm_map) == n
    assert sorted(perm_map) == sorted(id_map) == list(range(1, n + 1))
    assert 0 not in id_map and 0 not in perm_map


def test_permutation_cycles_match_continuity_spec():
    for rows, n_state, n_plain in [(8, 2, 1), (4, 1, 0), (16, 3, 2)]:
        c, _ = _build(rows, n_state, n_plain)
        id_map, perm_map = c.permutation()
        got = _classes_from_mapping(id_map, perm_map)
        assert got == _expected_classes(c), (rows, n_state, n_plain)


def test_permutation_agrees_with_check_constraints_on_witness():
    """A witness satisfies the permutation's value-equality classes iff
    check_constraints' continuity block accepts it (brute force over every
    single-cell corruption of the state columns)."""
    import random

    rng = random.Random(0)
    c, cells = _build(num_rows=4, n_state=2, n_plain=0)
    rows, cols = c.num_rows(), c.num_cols()
    id_map, perm_map = c.permutation()
    classes = _classes_from_mapping(id_map, perm_map)

    def flat(w):
        return [w[col][row] for col in range(cols) for row in range(rows)]

    def classes_ok(w):
        f = flat(w)
        return all(len({f[i] for i in cl}) == 1 for cl in classes)

    def continuity_ok(w):
        return all(w[cell.next.col][r] == w[cell.current.col][r + 1]
                   for cell in c.state_cells for r in range(rows - 1))

    # a valid witness: fill continuity chains with random values
    w = [[rng.randrange(100) for _ in range(rows)] for _ in range(cols)]
    for cell in c.state_cells:
        for r in range(rows - 1):
            w[cell.current.col][r + 1] = w[cell.next.col][r]
    assert classes_ok(w) and continuity_ok(w)

    for col in range(cols):
        for row in range(rows):
            bad = [list(col_v) for col_v in w]
            bad[col][row] += 1000
            assert classes_ok(bad) == continuity_ok(bad), (col, row)
