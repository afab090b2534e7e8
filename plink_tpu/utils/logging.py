"""Run logging: console + <out>.log mirroring (ref: 2.0/plink2_cmdline.h:75-167).

Every invocation writes `<out prefix>.log` containing the banner, the command
line, and all console output — the reference's reproducibility contract.
"""

from __future__ import annotations

import sys
import time

from .. import __version__

_BANNER = f"PLINK-TPU v{__version__} (plink_tpu engine)"


class RunLogger:
    def __init__(self, out_prefix: str | None = None, silent: bool = False):
        self.silent = silent
        self._file = None
        self._start = time.time()
        if out_prefix:
            self._file = open(out_prefix + ".log", "w")

    def log(self, msg: str = "", console: bool = True) -> None:
        if console and not self.silent:
            sys.stdout.write(msg + "\n")
            sys.stdout.flush()
        if self._file:
            self._file.write(msg + "\n")

    def banner(self, argv: list[str] | None = None) -> None:
        self.log(_BANNER)
        if argv:
            self.log("Options in effect:")
            self.log("  " + " ".join(argv))
            self.log("")

    def elapsed(self) -> float:
        return time.time() - self._start

    def close(self) -> None:
        if self._file:
            self.log(f"End time: {time.strftime('%a %b %d %H:%M:%S %Y')}", console=False)
            self._file.close()
            self._file = None


_global_logger: RunLogger | None = None


def get_logger() -> RunLogger:
    global _global_logger
    if _global_logger is None:
        _global_logger = RunLogger()
    return _global_logger


def set_logger(lg: RunLogger) -> None:
    global _global_logger
    _global_logger = lg
