"""Multi-turn session control.

Role model: reference `python/sglang/srt/managers/session_controller.py`
(/open_session, /close_session, `session_params` request chaining).  A
session stores the accumulated token history; follow-up requests prepend it,
and the radix prefix cache turns the replay into a KV-cache hit.
"""

from __future__ import annotations

import threading
import uuid
from typing import Dict, List, Optional


class Session:
    def __init__(self, session_id: str, capacity_of_str_len: int = 1 << 20):
        self.session_id = session_id
        self.tokens: List[int] = []
        self.capacity = capacity_of_str_len


class SessionController:
    def __init__(self):
        self.sessions: Dict[str, Session] = {}
        self.lock = threading.Lock()

    def open_session(self, session_id: Optional[str] = None) -> str:
        sid = session_id or uuid.uuid4().hex
        with self.lock:
            if sid in self.sessions:
                raise ValueError(f"session {sid} already exists")
            self.sessions[sid] = Session(sid)
        return sid

    def close_session(self, session_id: str):
        with self.lock:
            self.sessions.pop(session_id, None)

    def get_context(self, session_id: str) -> List[int]:
        with self.lock:
            s = self.sessions.get(session_id)
            if s is None:
                raise ValueError(f"unknown session {session_id}")
            return list(s.tokens)

    def append(self, session_id: str, tokens: List[int]):
        with self.lock:
            s = self.sessions.get(session_id)
            if s is not None:
                s.tokens.extend(tokens)
                if len(s.tokens) > s.capacity:
                    s.tokens = s.tokens[-s.capacity :]
