"""Agent-loop failure paths at reference depth (VERDICT r2 #8).

Behavior spec ported from the reference's overflow machinery
(``src/archi/pipelines/agents/base_react.py:1309-1367`` compression,
``:1449`` overflow recovery) and stream cancellation
(``chat_app/app.py:4150``): property-style checks that

- context-overflow compression injects a summary, preserves the newest
  turns verbatim, and the retried answer is still grounded in the
  summarized facts;
- the overflow ladder escalates compress → truncate-tool-results →
  ContextOverflowError;
- recursion-limit recovery survives a failing recovery call;
- overflow during streaming falls back to the compressing non-stream
  step, while MID-stream failures (tokens already emitted) do not
  silently retry;
- astream supports concurrent consumers and mid-stream cancellation
  without leaking further model steps.
"""

import asyncio
import threading

import numpy as np
import pytest

from archi_tpu.engine.vectorstore import TpuVectorStore
from archi_tpu.pipelines.agents.base_react import (
    BaseReActAgent, ContextOverflowError,
)
from archi_tpu.providers.chat_model import ScriptedChatModel
from archi_tpu.utils.messages import Message, ToolCall, user
from tests.unit.test_vectorstore import FakeEmbeddings

DOCS = [
    ("submit jobs with the batch scheduler", {"display_name": "jobs.txt"}),
    ("vector embeddings power search", {"display_name": "vec.txt"}),
]


@pytest.fixture
def store():
    s = TpuVectorStore(FakeEmbeddings(), dtype=np.float32)
    s.add_texts([d for d, _ in DOCS], [m for _, m in DOCS])
    return s


def _agent(store, **kw):
    return BaseReActAgent({"pipelines": {"BaseReActAgent": {}}}, **kw)


# ------------------------------------------------------- compression spec
@pytest.mark.parametrize("n_turns", [5, 8, 16, 30])
def test_compression_preserves_newest_turns_and_injects_summary(
        store, n_turns):
    agent = _agent(store)

    class Summarizer(ScriptedChatModel):
        def invoke(self, messages, *, tools=None, **kw):
            # echo the facts it was asked to summarize
            return Message("assistant",
                           "SUMMARY<<" + messages[-1].content[-200:] + ">>")

    agent.llms["agent_model"] = Summarizer([])
    msgs = agent._build_messages(
        [("User", f"fact-{i}: the sky is blue") for i in range(n_turns)])
    out = agent._compress_history(list(msgs))
    # system prompt survives in position 0
    assert out[0].role == "system" and out[0] is msgs[0]
    # newest 3 messages kept verbatim
    assert out[-3:] == msgs[-3:]
    # exactly one injected summary note, marked as such
    notes = [m for m in out
             if "[Earlier conversation, summarized]" in m.content]
    assert len(notes) == 1
    assert "SUMMARY<<" in notes[0].content
    # compressed form is strictly shorter for long histories
    assert len(out) < len(msgs)


def test_compression_noop_for_short_histories(store):
    agent = _agent(store)
    msgs = agent._build_messages([("User", "hi")])
    assert agent._compress_history(list(msgs)) == msgs


def test_compressed_answer_still_grounded(store):
    """After overflow + compression the model's answer can still use the
    summarized facts: the summary (containing the magic token) must be in
    the messages of the retried call."""
    seen = {}

    class OverflowThenAnswer(ScriptedChatModel):
        def __init__(self):
            super().__init__([])
            self.calls = 0

        def invoke(self, messages, *, tools=None, **kw):
            text = "\n".join(m.content for m in messages)
            if "Summarize this conversation" in text:
                return Message("assistant", "user deploys on XYZZY-42")
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("maximum context length exceeded")
            seen["retry_messages"] = text
            if "XYZZY-42" in text:
                return Message("assistant", "Grounded: XYZZY-42")
            return Message("assistant", "lost the context")

    agent = _agent(store)
    agent.llms["agent_model"] = OverflowThenAnswer()
    history = [("User", "I deploy on cluster XYZZY-42 " + "pad " * 100)] \
        * 6 + [("User", "which cluster do I use?")]
    out = agent.invoke(history=history, vectorstore=store,
                       stream_tokens=False)
    assert out.answer == "Grounded: XYZZY-42", seen.get("retry_messages")


# --------------------------------------------------------- overflow ladder
def test_overflow_ladder_truncates_then_raises(store):
    """compress (attempt 0) → truncate tool results to 1000 chars
    (attempt 1) → ContextOverflowError (attempt 2) — the reference's
    escalation order."""
    attempts = []

    class AlwaysOverflow(ScriptedChatModel):
        def invoke(self, messages, *, tools=None, **kw):
            text = "\n".join(m.content for m in messages)
            if "Summarize this conversation" in text:
                return Message("assistant", "short summary")
            attempts.append([len(m.content) for m in messages])
            raise RuntimeError("prompt is too long")

    agent = _agent(store)
    agent.llms["agent_model"] = AlwaysOverflow([])
    history = [("User", "x" * 3000)] * 6 + [("User", "q")]
    with pytest.raises(ContextOverflowError):
        agent.invoke(history=history, vectorstore=store,
                     stream_tokens=False)
    assert len(attempts) == 3
    # attempt 2 (after truncation) must see no message over 1000 chars
    assert max(attempts[2]) <= 1000
    # and the ladder monotonically shrinks the payload
    assert sum(attempts[2]) < sum(attempts[0])


def test_mid_stream_failure_is_not_retried(store):
    """Once tokens were emitted, a stream failure must surface — a silent
    retry would duplicate already-streamed output for the client."""

    class MidStreamBlowup(ScriptedChatModel):
        def stream(self, messages, *, tools=None, **kw):
            yield Message("assistant", "partial ", metadata={"delta": True})
            raise RuntimeError("connection reset")

    agent = _agent(store)
    agent.llms["agent_model"] = MidStreamBlowup([])
    with pytest.raises(RuntimeError, match="connection reset"):
        list(agent.stream(history=[("User", "q")], vectorstore=store))


def test_stream_overflow_before_tokens_falls_back_to_compression(store):
    calls = {"stream": 0, "invoke": 0}

    class StreamOverflow(ScriptedChatModel):
        def stream(self, messages, *, tools=None, **kw):
            calls["stream"] += 1
            raise RuntimeError("maximum context length exceeded")
            yield  # pragma: no cover

        def invoke(self, messages, *, tools=None, **kw):
            text = "\n".join(m.content for m in messages)
            if "Summarize this conversation" in text:
                return Message("assistant", "s")
            calls["invoke"] += 1
            if calls["invoke"] == 1:
                raise RuntimeError("maximum context length exceeded")
            return Message("assistant", "recovered")

    agent = _agent(store)
    agent.llms["agent_model"] = StreamOverflow([])
    out = agent.invoke(
        history=[("User", "y" * 2000)] * 6 + [("User", "q")],
        vectorstore=store)
    assert out.answer == "recovered"
    assert calls["stream"] == 1 and calls["invoke"] == 2


# --------------------------------------------------- recursion-limit paths
def test_recursion_recovery_call_failure_degrades_gracefully(store):
    looping = Message("assistant", "", tool_calls=[
        ToolCall("search_vectorstore_hybrid", {"query": "x"}, "")])

    class LoopThenDie(ScriptedChatModel):
        def invoke(self, messages, *, tools=None, **kw):
            if tools is None:          # the budget-exhausted recovery call
                raise RuntimeError("provider 500")
            return looping

    agent = _agent(store, recursion_limit=2)
    agent.llms["agent_model"] = LoopThenDie([])
    out = agent.invoke(history=[("User", "q")], vectorstore=store,
                       stream_tokens=False)
    assert out.metadata["hit_recursion_limit"]
    assert "stopped at recursion limit" in out.answer
    assert out.metadata["steps"] == 2


def test_recursion_recovery_keeps_gathered_evidence(store):
    """The budget-exhausted recovery prompt must include the transcript
    (tool results gathered so far), not a fresh context."""
    seen = {}

    class Loop(ScriptedChatModel):
        def invoke(self, messages, *, tools=None, **kw):
            if tools is None:
                seen["ctx"] = "\n".join(m.content for m in messages)
                return Message("assistant", "best-effort")
            return Message("assistant", "", tool_calls=[
                ToolCall("search_vectorstore_hybrid",
                         {"query": "batch scheduler"}, "")])

    agent = _agent(store, recursion_limit=2)
    agent.llms["agent_model"] = Loop([])
    out = agent.invoke(history=[("User", "q")], vectorstore=store,
                       stream_tokens=False)
    assert out.answer == "best-effort"
    assert "batch scheduler" in seen["ctx"]   # retrieved docs in context
    assert "Tool budget exhausted" in seen["ctx"]


# ------------------------------------------------------------------ astream
def _token_agent(store, n_tokens=50, started=None, steps_done=None):
    class SlowStream(ScriptedChatModel):
        def stream(self, messages, *, tools=None, **kw):
            if started is not None:
                started.set()
            for i in range(n_tokens):
                if steps_done is not None:
                    steps_done.append(i)
                yield Message("assistant", f"t{i} ",
                              metadata={"delta": True})
            yield Message("assistant", "")

    agent = _agent(store)
    agent.llms["agent_model"] = SlowStream([])
    return agent


def test_astream_concurrent_consumers(store):
    """Two agents astream concurrently on one event loop; events do not
    cross between them and both finish."""

    async def run():
        a1 = _token_agent(store, n_tokens=20)
        a2 = _token_agent(store, n_tokens=20)

        async def consume(agent, tag):
            outs = []
            async for out in agent.astream(history=[("User", tag)],
                                           vectorstore=store):
                outs.append(out)
            return outs

        r1, r2 = await asyncio.gather(consume(a1, "one"),
                                      consume(a2, "two"))
        for r in (r1, r2):
            assert r[-1].final
            deltas = [o.metadata["event"]["delta"] for o in r[:-1]
                      if o.metadata.get("event", {}).get("type") == "token"]
            assert len(deltas) == 20
        return True

    assert asyncio.run(run())


def test_astream_cancellation_stops_consumption(store):
    """Cancelling the consumer mid-stream stops pulling the generator —
    the model must not be driven to completion afterwards (the analog of
    /api/cancel_stream killing a live SSE stream)."""
    steps_done: list[int] = []
    started = threading.Event()

    async def run():
        agent = _token_agent(store, n_tokens=10_000, started=started,
                             steps_done=steps_done)

        async def consume():
            async for _ in agent.astream(history=[("User", "q")],
                                         vectorstore=store):
                if len(steps_done) >= 5:
                    raise asyncio.CancelledError()

        task = asyncio.ensure_future(consume())
        with pytest.raises(asyncio.CancelledError):
            await task

    asyncio.run(run())
    assert started.is_set()
    n_after_cancel = len(steps_done)
    # the generator may finish the step in flight, but must not be pulled
    # to the end of the 10k-token script
    import time

    time.sleep(0.2)
    assert len(steps_done) <= n_after_cancel + 2
    assert len(steps_done) < 10_000
