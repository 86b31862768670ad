"""KV logger with multiple output formats (re-design of the OpenAI baselines
logger the reference vendors at ``src/logger.py``).

Formats: ``stdout`` (aligned table), ``log`` (same to file), ``json``
(one JSON object per dump line), ``csv`` (rewriting header on new keys),
``tensorboard`` (via ``tensorboardX``/``torch.utils.tensorboard`` when
available, silently skipped otherwise).  ``logkv_mean`` accumulates running
means between dumps; ``profile_kv`` times scopes into ``wait_<name>`` keys —
all per the reference semantics (``logger.py:236-348``).
"""

from __future__ import annotations

import csv as _csv
import json
import os
import time
from contextlib import contextmanager
from typing import Any

DEBUG, INFO, WARN, ERROR, DISABLED = 10, 20, 30, 40, 50


class KVWriter:
    def writekvs(self, kvs: dict) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class SeqWriter:
    def writeseq(self, seq) -> None:
        raise NotImplementedError


class HumanOutputFormat(KVWriter, SeqWriter):
    def __init__(self, filename_or_file):
        if isinstance(filename_or_file, str):
            self.file = open(filename_or_file, "at")
            self.own_file = True
        else:
            self.file = filename_or_file
            self.own_file = False

    def writekvs(self, kvs):
        key2str = {}
        for key, val in sorted(kvs.items()):
            valstr = f"{val:<8.3g}" if hasattr(val, "__float__") else str(val)
            key2str[self._truncate(key)] = self._truncate(valstr)
        if not key2str:
            return
        keywidth = max(map(len, key2str.keys()))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for key, val in sorted(key2str.items()):
            lines.append(f"| {key}{' ' * (keywidth - len(key))} | "
                         f"{val}{' ' * (valwidth - len(val))} |")
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    @staticmethod
    def _truncate(s, maxlen: int = 30):
        return s[: maxlen - 3] + "..." if len(s) > maxlen else s

    def writeseq(self, seq):
        self.file.write(" ".join(map(str, seq)) + "\n")
        self.file.flush()

    def close(self):
        if self.own_file:
            self.file.close()


class JSONOutputFormat(KVWriter):
    def __init__(self, filename: str):
        self.file = open(filename, "at")

    def writekvs(self, kvs):
        out = {k: float(v) if hasattr(v, "__float__") else v
               for k, v in kvs.items()}
        self.file.write(json.dumps(out) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    def __init__(self, filename: str):
        self.filename = filename
        self.keys: list[str] = []
        self.rows: list[dict] = []

    def writekvs(self, kvs):
        new_keys = [k for k in kvs if k not in self.keys]
        if new_keys:
            self.keys.extend(sorted(new_keys))
        self.rows.append(dict(kvs))
        with open(self.filename, "wt", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=self.keys, restval="")
            w.writeheader()
            for row in self.rows:
                w.writerow({k: row.get(k, "") for k in self.keys})


class TensorBoardOutputFormat(KVWriter):
    def __init__(self, logdir: str):
        self.step = 0
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(logdir)
        except Exception:
            self.writer = None

    def writekvs(self, kvs):
        if self.writer is None:
            return
        step = int(kvs.get("step", self.step))
        for k, v in kvs.items():
            if hasattr(v, "__float__"):
                self.writer.add_scalar(k, float(v), step)
        self.writer.flush()
        self.step += 1

    def close(self):
        if self.writer is not None:
            self.writer.close()


def make_output_format(fmt: str, ev_dir: str, log_suffix: str = "") -> KVWriter:
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        import sys
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(os.path.join(ev_dir, f"log{log_suffix}.txt"))
    if fmt == "json":
        return JSONOutputFormat(os.path.join(ev_dir, f"progress{log_suffix}.json"))
    if fmt == "csv":
        return CSVOutputFormat(os.path.join(ev_dir, f"progress{log_suffix}.csv"))
    if fmt in ("tensorboard", "tensorboard_new"):
        return TensorBoardOutputFormat(os.path.join(ev_dir, f"tb{log_suffix}"))
    raise ValueError(f"Unknown format specified: {fmt}")


class Logger:
    CURRENT: "Logger | None" = None

    def __init__(self, dir: str | None, output_formats: list[KVWriter]):
        self.name2val: dict[str, Any] = {}
        self.name2cnt: dict[str, int] = {}
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats
        self._start_times: dict[str, float] = {}

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        oldval, cnt = self.name2val.get(key, 0), self.name2cnt.get(key, 0)
        self.name2val[key] = oldval * cnt / (cnt + 1) + float(val) / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        d = self.name2val
        out = d.copy()
        for fmt in self.output_formats:
            if isinstance(fmt, KVWriter):
                fmt.writekvs(d)
        self.name2val.clear()
        self.name2cnt.clear()
        return out

    def log(self, *args, level: int = INFO):
        if self.level <= level:
            for fmt in self.output_formats:
                if isinstance(fmt, SeqWriter):
                    fmt.writeseq(map(str, args))

    def set_level(self, level: int):
        self.level = level

    def close(self):
        for fmt in self.output_formats:
            fmt.close()

    @contextmanager
    def profile_kv(self, scopename: str):
        key = f"wait_{scopename}"
        start = time.time()
        try:
            yield
        finally:
            self.name2val[key] = self.name2val.get(key, 0) + time.time() - start


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def configure(dir: str | None = None,
              format_strs: list[str] | None = None,
              log_suffix: str = "") -> Logger:
    """Configure the global logger (env vars ``OPENAI_LOGDIR`` /
    ``OPENAI_LOG_FORMAT`` honored for reference parity).

    Multi-process: non-zero processes get a ``-rank{i}`` file suffix and a
    reduced format set (reference ``logger.py:481-489`` rank behavior)."""
    if dir is None:
        dir = os.environ.get("OPENAI_LOGDIR") or os.path.join(
            "/tmp", f"confild-{time.strftime('%Y%m%d-%H%M%S')}")
    rank = _process_index()
    if rank > 0:
        log_suffix = f"{log_suffix}-rank{rank:03d}"
        format_strs = os.environ.get(
            "OPENAI_LOG_FORMAT_MPI", "log").split(",")
    elif format_strs is None:
        format_strs = os.environ.get(
            "OPENAI_LOG_FORMAT", "stdout,log,csv").split(",")
    output_formats = [make_output_format(f, dir, log_suffix)
                      for f in format_strs if f]
    Logger.CURRENT = Logger(dir, output_formats)
    return Logger.CURRENT


def get_current() -> Logger:
    if Logger.CURRENT is None:
        configure(format_strs=["stdout"])
    return Logger.CURRENT


def logkv(key, val):
    get_current().logkv(key, val)


def logkv_mean(key, val):
    get_current().logkv_mean(key, val)


def dumpkvs():
    return get_current().dumpkvs()


def log(*args, **kwargs):
    get_current().log(*args, **kwargs)


@contextmanager
def profile_kv(scopename: str):
    with get_current().profile_kv(scopename):
        yield


def profile(fn):
    def wrapped(*args, **kwargs):
        with profile_kv(fn.__name__):
            return fn(*args, **kwargs)
    return wrapped


def get_logger(name: str = "DPS"):
    """Tiny stdlib logger (reference ``src/util/logger.py`` get_logger)."""
    import logging
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s [%(name)s] >> %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger
