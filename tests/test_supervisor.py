"""Supervisor (failure detection / auto-restart) behaviour, driven with
scripted child processes so no device or real training run is needed."""

import os
import sys
import textwrap

import pytest

from connect4_tpu.training.supervisor import supervise


@pytest.fixture()
def run_dir(tmp_path):
    (tmp_path / "run").mkdir()
    (tmp_path / "config.py").write_text(
        textwrap.dedent(
            f"""
            from connect4_tpu.config import AlphaZeroConfig, StorageConfig
            config = AlphaZeroConfig(
                storage_config=StorageConfig(
                    save_dir={str(tmp_path / 'run')!r},
                    data_dir={str(tmp_path / 'nodata')!r},
                ),
            )
            """
        )
    )
    return tmp_path


def _child(body: str) -> list:
    return [sys.executable, "-c", textwrap.dedent(body)]


def test_supervisor_passes_through_clean_exit(run_dir):
    code = supervise(
        str(run_dir / "config.py"),
        str(run_dir / "train.log"),
        poll_seconds=0.1,
        stall_seconds=30,
        settle_seconds=0,
        command=_child("print('gen done', flush=True)"),
    )
    assert code == 0
    assert b"gen done" in (run_dir / "train.log").read_bytes()


def test_supervisor_restarts_wedged_child_and_counts_dead_starts(run_dir):
    # child prints nothing and hangs: no log heartbeat -> killed, and with
    # max_restarts=2 the supervisor gives up after 2 dead starts
    code = supervise(
        str(run_dir / "config.py"),
        str(run_dir / "train.log"),
        poll_seconds=0.1,
        stall_seconds=0.5,
        settle_seconds=0,
        max_restarts=2,
        command=_child("import time; time.sleep(600)"),
    )
    assert code == 1


def test_supervisor_stops_at_stop_file_instead_of_restarting(run_dir):
    # child "crashes" (exit 3) after touching STOP: supervisor must not
    # relaunch, mirroring a run interrupted on purpose mid-generation
    stop = run_dir / "run" / "STOP"
    code = supervise(
        str(run_dir / "config.py"),
        str(run_dir / "train.log"),
        poll_seconds=0.1,
        stall_seconds=30,
        settle_seconds=0,
        command=_child(
            f"""
            import pathlib, sys
            print('working', flush=True)
            pathlib.Path({str(stop)!r}).touch()
            sys.exit(3)
            """
        ),
    )
    assert code == 3


def test_supervisor_restarts_crashed_child_until_success(run_dir, tmp_path):
    # first run crashes (UNAVAILABLE-style), second completes — the
    # checkpoint-resume contract means a plain relaunch is the fix
    marker = tmp_path / "crashed_once"
    code = supervise(
        str(run_dir / "config.py"),
        str(run_dir / "train.log"),
        poll_seconds=0.1,
        stall_seconds=30,
        settle_seconds=0,
        command=_child(
            f"""
            import pathlib, sys
            m = pathlib.Path({str(marker)!r})
            print('attempt', flush=True)
            if not m.exists():
                m.touch()
                raise SystemExit(1)
            print('resumed and finished', flush=True)
            """
        ),
    )
    assert code == 0
    assert b"resumed and finished" in (run_dir / "train.log").read_bytes()
