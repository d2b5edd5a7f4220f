"""Production serving for interactive VOS sessions.

The reference ships a desktop GUI only; this package adds the
deployment surface a production user needs: a thread-safe session
manager that pins sessions to chips (one compiled program set shared
per device kind, fleet-style placement — eval/fleet.py) and a
dependency-free HTTP front end (serve.py at the repo root).
"""
from mivos_tpu.serve.server import (SessionManager, VOSRequestHandler,
                                    make_server, shutdown_gracefully)

__all__ = ["SessionManager", "VOSRequestHandler", "make_server",
           "shutdown_gracefully"]
