"""7-ply benchmark builder behaviour, without touching the exact solver.

Exactly solving real 7-ply positions is a multi-hour CPU job (that is the
whole point of the offline dataset build), so these tests drive the
builder with a synthetic fully-solved 8-ply child table: every
non-terminal child resolves by table lookup and the builder's own logic
(terminal detection, minimax over children, optimal-move policies,
solved-mask filtering, partial emission) is exercised end to end in
milliseconds.
"""

import numpy as np

from connect4_tpu.data import datasets
from connect4_tpu.data.datasets import (
    _COL_BASE,
    _COL_FULL,
    _load_8ply_status,
    _wins,
    build_7ply,
    enumerate_positions,
)

N_POS = 48


def _children(o, x):
    """(col, child_x_bits) pairs for x moving at ply 7, skipping wins/draws."""
    out = []
    mask = o | x
    for c in range(7):
        cell = (mask + _COL_BASE[c]) & _COL_FULL[c]
        if not cell:
            continue
        nx = x | cell
        if _wins(nx) or (mask | cell) == datasets._BOARD:
            continue
        out.append((c, nx))
    return out


def _fake_table_npz(path, ips, value_fn, solved_fn=lambda *_: True):
    o_list, x_list, vals, solved = [], [], [], []
    for o, x in ips:
        for c, nx in _children(o, x):
            o_list.append(o)
            x_list.append(nx)
            vals.append(value_fn(o, nx, c))
            solved.append(solved_fn(o, nx, c))
    np.savez_compressed(
        path,
        planes=np.zeros((len(o_list), 3, 6, 7), np.uint8),
        values=np.array(vals, np.float32),
        solved=np.array(solved, bool),
        o_bits=np.array(o_list, np.uint64),
        x_bits=np.array(x_list, np.uint64),
    )


def test_7ply_build_from_table_minimax_and_policy(tmp_path):
    ips = enumerate_positions(7)[:N_POS]
    rng = np.random.default_rng(0)
    table_vals = {}

    def value_fn(o, nx, c):
        return table_vals.setdefault((o, nx), float(rng.choice([0.0, 0.5, 1.0])))

    _fake_table_npz(tmp_path / "connect4dataset_8ply.npz", ips, value_fn)
    out = tmp_path / "connect4dataset_7ply.npz"
    build_7ply(str(out), limit=N_POS, chunk=16, verbose=False)

    with np.load(out) as d:
        assert len(d["values"]) == N_POS
        assert d["solved"].all()
        for i, (o, x) in enumerate(ips):
            # recompute expected minimax label directly
            child_vals = {}
            mask = o | x
            for c in range(7):
                cell = (mask + _COL_BASE[c]) & _COL_FULL[c]
                if not cell:
                    continue
                nx = x | cell
                if _wins(nx):
                    child_vals[c] = 0.0
                elif (mask | cell) == datasets._BOARD:
                    child_vals[c] = 0.5
                else:
                    child_vals[c] = table_vals[(o, nx)]
            best = min(child_vals.values())  # x minimises
            assert d["values"][i] == best, i
            optimal = {c for c, v in child_vals.items() if abs(v - best) < 1e-9}
            pol = d["policies"][i]
            np.testing.assert_allclose(pol.sum(), 1.0, atol=1e-6)
            assert set(np.nonzero(pol)[0]) == optimal, i
            np.testing.assert_allclose(pol[sorted(optimal)], 1.0 / len(optimal))


def test_7ply_follow_rides_growing_8ply_table(tmp_path):
    """With follow=True the builder must NOT solve unsolved-but-known UCI
    children itself; it waits and re-resolves when the 8-ply npz grows
    (the two dataset builds share one machine — duplicating the proofs in
    two transposition tables would double the total work)."""
    import threading
    import time as _time

    ips = enumerate_positions(7)[:N_POS]
    table_path = tmp_path / "connect4dataset_8ply.npz"
    # half the children start unsolved (the builder must defer them)
    _fake_table_npz(
        table_path, ips,
        value_fn=lambda *_: 1.0,
        solved_fn=lambda o, nx, c: c % 2 == 0,
    )
    out = tmp_path / "connect4dataset_7ply.npz"

    done = []

    def run():
        build_7ply(
            str(out), limit=N_POS, chunk=16, verbose=False,
            follow=True, poll_seconds=0.05,
        )
        done.append(True)

    t = threading.Thread(target=run)
    t.start()
    _time.sleep(1.0)  # let pass 1 defer the blocked positions
    _fake_table_npz(table_path, ips, value_fn=lambda *_: 1.0)  # now complete
    t.join(timeout=120)
    assert done, "follow build did not finish after the table completed"

    with np.load(out) as d:
        assert d["solved"].all()
        # every table child is 1.0, so a position's value is 0.0 exactly
        # when x has an immediate winning reply (terminal child), else 1.0
        for i, (o, x) in enumerate(ips):
            mask = o | x
            x_win = any(
                _wins(x | cell)
                for c in range(7)
                if (cell := (mask + _COL_BASE[c]) & _COL_FULL[c])
            )
            assert d["values"][i] == (0.0 if x_win else 1.0), i


def test_load_8ply_table_filters_unsolved_rows(tmp_path):
    """The bug this guards: a partially-built 8-ply set stores placeholder
    0.5 for unsolved rows; loading them as real values would silently
    poison 7-ply labels."""
    ips = enumerate_positions(7)[:4]
    path = tmp_path / "connect4dataset_8ply.npz"
    _fake_table_npz(
        path, ips,
        value_fn=lambda *_: 1.0,
        solved_fn=lambda o, nx, c: c % 2 == 0,  # odd columns unsolved
    )
    table, pending = _load_8ply_status(str(path))
    for o, x in ips:
        for c, nx in _children(o, x):
            if c % 2 == 0:
                assert table[(o, nx)] == 1.0
            else:
                assert (o, nx) not in table
                assert (o, nx) in pending
    assert _load_8ply_status(str(tmp_path / "missing.npz")) == ({}, set())


def test_7ply_partial_dataset_feeds_training_eval(tmp_path):
    """A partially-solved 7-ply npz (solved mask) must be consumable by
    TrainingLoop._evaluate's filter — synthesising the file shape the
    builder emits mid-run."""
    n = 32
    np.savez_compressed(
        tmp_path / "connect4dataset_7ply.npz",
        planes=np.zeros((n, 3, 6, 7), np.uint8),
        values=np.full(n, 0.5, np.float32),
        solved=np.arange(n) % 2 == 0,
        policies=np.full((n, 7), 1.0 / 7, np.float32),
        o_bits=np.zeros(n, np.uint64),
        x_bits=np.zeros(n, np.uint64),
    )
    with np.load(tmp_path / "connect4dataset_7ply.npz") as d:
        solved = d["solved"]
        assert solved.sum() == n // 2
        assert d["planes"][solved].shape[0] == n // 2
