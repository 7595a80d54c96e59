"""Alerter incident lifecycle — notifications → incidents → dialogs →
messages (reference src/RamenAlerter.ml).

The reference runs a dedicated alerter daemon fed by workers over a
ringbuffer; its data model (RamenAlerter.ml:15-50 glossary):

- a *notification* (NOTIFY) signals the start (firing) or end of a
  problem, identified by name;
- an *incident* deduplicates notifications by name: created by the
  first firing notification of a name not already firing, ended by a
  non-firing notification for the same name;
- a *dialog* exists per (incident, contact) and walks the delivery
  FSM (RamenAlerter.ml DeliveryStatus): StartToBeSent → StartSent →
  StartAcked, with StopToBeSent/StopSent on extinguish and
  StartToBeSentThenStopped cancelling an unsent start;
- *messages* are sent after a *debounce* delay so flapping incidents
  don't spam, retried every contact ``timeout`` seconds until acked.

Spark-first shape: the FSM is a deterministic event-time machine
(``Alerter``) driven by (time, notification) events — no wall clock,
no daemon. Live mode attaches it to a notification stream via
``foreachBatch`` (``alerter_sink``); replay mode feeds it the same
tuples from a batch frame, producing identical journals. Contact
delivery is a callable (the http/exec/kafka/sqlite contact surface,
RamenAlerter.ml contacts) — tests use a log-list stand-in.

Implemented beyond the dialog FSM: the false-positive-rate budget
(``pass_fpr``, RamenAlerter.ml:379-425 — the exact convolution of
Bernoulli(1−certainty) over the recent incidents, pass iff
P(> ceil(dt·max_fpr) false positives) ≤ 0.5; event-time ``now``
instead of the wall clock, so replays are deterministic),
per-notification firing timeouts (an incident extinguishes after
``timeout`` seconds without a firing — Stop Timeout), and incident
age-out (``max_incident_age``: scheduled work for an incident whose
first notification is too old cancels it). Deliberate v1 cut: manual
outage grouping.
"""

from __future__ import annotations

import heapq
import itertools
import math
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

__all__ = ["Contact", "Alerter", "alerter_sink"]

# DeliveryStatus (src/ramen_sync values, RamenAlerter.ml transitions)
START_TO_BE_SENT = "StartToBeSent"
START_SENT = "StartSent"
START_ACKED = "StartAcked"
START_TO_BE_SENT_THEN_STOPPED = "StartToBeSentThenStopped"
STOP_TO_BE_SENT = "StopToBeSent"
STOP_SENT = "StopSent"


@dataclass
class Contact:
    """A team contact. ``via`` receives (incident_id, contact_name,
    is_start, notification_dict); ``timeout`` > 0 means the message is
    resent every ``timeout`` seconds until acknowledged
    (tests/alerter/retry.test), 0 means fire-and-forget
    (tests/alerter/basic.test Ignore contact)."""

    name: str
    via: Callable[[str, str, bool, dict], None] | None = None
    timeout: float = 0.0


@dataclass
class _Dialog:
    status: str = START_TO_BE_SENT
    attempts: int = 0
    send_time: float | None = None


@dataclass
class _Incident:
    id: str
    name: str
    team: str
    first_start: dict
    journal: list[tuple[float, str]] = field(default_factory=list)
    dialogs: dict[str, _Dialog] = field(default_factory=dict)
    last_firing: float = 0.0
    timeout: float = 0.0  # auto-extinguish horizon (0 = none)
    # outage membership (RamenAlerter.ml:41-43): every incident starts
    # as its own outage; users group incidents to document a shared
    # root cause (no effect on delivery)
    outage: str = ""


def _ordinal(n: int) -> str:
    if 10 <= n % 100 <= 20:
        return f"{n}th"
    return f"{n}{ {1: 'st', 2: 'nd', 3: 'rd'}.get(n % 10, 'th') }"


def pass_fpr(
    max_fpr: float,
    last_incidents: list[tuple[float, float]],
    certainty: float,
    now: float,
) -> bool:
    """False-positive-rate budget (RamenAlerter.ml:379-425 pass_fpr):
    given the (time, certainty) of recently created incidents, admit a
    new incident of the given certainty iff the probability of having
    created more than ``ceil(dt × max_fpr)`` false positives —
    computed by convolving Bernoulli(1−certainty) over all of them
    plus the candidate — stays ≤ 0.5. Certainty ≥ 1 always passes;
    the first incident ever always passes."""
    if certainty >= 1.0:
        return True
    certainty = min(max(certainty, 0.0), 1.0)
    if not last_incidents:
        return True
    oldest = min(t for t, _ in last_incidents)
    dt = now - oldest
    max_fp = math.ceil(dt * max_fpr)
    if max_fp < 1:
        return False  # bogus dt
    if max_fp > 1 + len(last_incidents):
        return True  # not enough incidents yet to exceed the budget
    p_junks = [0.0] * (max_fp + 1)
    p_junks[0] = 1.0

    def send(c: float) -> None:
        c = min(max(c, 0.0), 1.0)
        p_junk = 1.0 - c
        for i in range(len(p_junks) - 1, -1, -1):
            p_junks[i] = p_junks[i] * c + (
                p_junks[i - 1] * p_junk if i > 0 else 0.0
            )

    for _, c in last_incidents:
        send(c)
    send(certainty)
    p_more = 1.0 - sum(p_junks)
    return p_more <= 0.5


class Alerter:
    """Deterministic event-time alerter FSM.

    Drive it with ``notify(now, name, firing=…)``, ``ack(...)`` and
    ``advance(now)`` (runs the scheduler heap up to ``now`` —
    RamenAlerter.ml's task heap). Incidents are dedup'd by
    notification name (``PendingMap``); team = longest team-name
    prefix of the notification name, else the default team
    (find_in_charge, RamenAlerter.ml:182-217).
    """

    def __init__(
        self,
        teams: dict[str, list[Contact]],
        default_team: str | None = None,
        debounce_delay: float = 30.0,
        max_fpr: float | None = None,
        max_incident_age: float | None = None,
        max_last_incidents_kept: int = 100,
    ):
        if not teams:
            raise ValueError("no teams configured, notifications would drop")
        self.teams = teams
        self.default_team = default_team or next(iter(teams))
        self.debounce_delay = debounce_delay
        self.max_fpr = max_fpr
        self.max_incident_age = max_incident_age
        self.incidents: dict[str, _Incident] = {}  # id → incident
        self.pending: dict[str, str] = {}  # firing name → incident id
        # (t, seq, inc, dlg-or-None); dlg None = incident-level task
        self._heap: list[tuple[float, int, str, str | None]] = []
        self._ids = itertools.count()
        self._seq = itertools.count()
        # (time, certainty) of recent creations, for pass_fpr
        self.last_incidents: list[tuple[float, float]] = []
        self._keep_last = max_last_incidents_kept

    # -- helpers -----------------------------------------------------------

    def _log(self, inc: _Incident, now: float, event: str) -> None:
        inc.journal.append((now, event))

    def _schedule(self, t: float, inc_id: str, dialog_id: str | None) -> None:
        heapq.heappush(self._heap, (t, next(self._seq), inc_id, dialog_id))

    def _find_in_charge(self, name: str) -> str:
        best, best_len = None, -1
        for team in self.teams:
            if name.startswith(team) and len(team) > best_len:
                best, best_len = team, len(team)
        return best if best is not None else self.default_team

    def _debounce_for(self, notif: dict) -> float:
        d = notif.get("debounce")
        return d if d is not None and d >= 0 else self.debounce_delay

    # -- notification intake (set_alight / extinguish_pending) -------------

    def notify(
        self,
        now: float,
        name: str,
        firing: bool = True,
        parameters: dict | None = None,
        debounce: float | None = None,
        certainty: float = 1.0,
        timeout: float | None = None,
        test: bool = False,
    ) -> None:
        notif = {
            "name": name,
            "parameters": dict(parameters or {}),
            "debounce": debounce,
            "certainty": certainty,
            "sent_time": now,
            "timeout": timeout,
            "test": test,
        }
        if firing:
            self._set_alight(notif, now)
        else:
            self._extinguish(notif, now)

    def _set_alight(self, notif: dict, now: float) -> None:
        inc_id = self.pending.get(notif["name"])
        if inc_id is None:
            # FPR budget gates CREATION only (RamenAlerter set_alight)
            if not notif["test"] and self.max_fpr is not None:
                if not pass_fpr(
                    self.max_fpr, self.last_incidents,
                    notif["certainty"], now,
                ):
                    return
            inc_id = str(next(self._ids))
            team = self._find_in_charge(notif["name"])
            inc = _Incident(
                id=inc_id, name=notif["name"], team=team, first_start=notif
            )
            for c in self.teams[team]:
                inc.dialogs[c.name] = _Dialog()
            inc.outage = inc_id  # own outage until grouped
            self.incidents[inc_id] = inc
            self.pending[notif["name"]] = inc_id
            if not notif["test"]:
                self.last_incidents.append((now, notif["certainty"]))
                del self.last_incidents[: -self._keep_last]
        inc = self.incidents[inc_id]
        inc.last_firing = now
        if notif["timeout"] is not None and notif["timeout"] > 0:
            # auto-extinguish when no firing arrives for `timeout`
            inc.timeout = float(notif["timeout"])
            self._schedule(now + inc.timeout, inc_id, None)
        self._update_dialogs(inc, notif, now)

    def _update_dialogs(self, inc: _Incident, notif: dict, now: float) -> None:
        # RamenAlerter.ml:340-375 update_dialogs
        schedule_time = now + self._debounce_for(notif)
        for dlg_id, dlg in inc.dialogs.items():
            if dlg.status == START_TO_BE_SENT:
                if dlg.attempts == 0 and dlg.send_time is None:
                    # initial_sent_schedule → journal StartEscalation
                    dlg.send_time = schedule_time
                    self._schedule(schedule_time, inc.id, dlg_id)
                    self._log(inc, now, "Notified")
                else:
                    self._log(inc, now, "Duplicate")
            elif dlg.status in (START_TO_BE_SENT_THEN_STOPPED, STOP_SENT):
                # came back while stopping: revive the start
                dlg.status = START_TO_BE_SENT
                dlg.attempts = 0
                dlg.send_time = schedule_time
                self._schedule(schedule_time, inc.id, dlg_id)
                self._log(inc, now, "Duplicate")
            elif dlg.status == STOP_TO_BE_SENT:
                dlg.status = START_ACKED
                self._log(inc, now, "Duplicate")
            else:  # StartAcked | StartSent
                self._log(inc, now, "Duplicate")

    def _extinguish(self, notif: dict, now: float) -> None:
        inc_id = self.pending.get(notif["name"])
        if inc_id is None:
            return  # reference logs a warning
        inc = self.incidents[inc_id]
        self._log(inc, now, "Stop Notification")
        for dlg_id, dlg in inc.dialogs.items():
            # stop_pending (RamenAlerter.ml:514-529)
            if dlg.status == START_TO_BE_SENT:
                dlg.status = START_TO_BE_SENT_THEN_STOPPED
            elif dlg.status in (START_SENT, START_ACKED):
                dlg.status = STOP_TO_BE_SENT
                dlg.attempts = 0
                t = now + self._debounce_for(notif)
                dlg.send_time = t
                self._schedule(t, inc.id, dlg_id)
        # incident no longer pending under its name: a new firing
        # notification for this name opens a NEW incident
        del self.pending[notif["name"]]

    def ack(self, now: float, inc_id: str, dialog_id: str) -> None:
        inc = self.incidents[inc_id]
        dlg = inc.dialogs[dialog_id]
        if dlg.status == START_SENT:
            dlg.status = START_ACKED
            self._log(inc, now, f"Acknowledged {dialog_id}")
        # other statuses: late/duplicate ack, ignored (RamenAlerter.ml:679)

    # -- scheduler (the reference's task heap) -----------------------------

    def _contact(self, inc: _Incident, dialog_id: str) -> Contact:
        for c in self.teams[inc.team]:
            if c.name == dialog_id:
                return c
        raise KeyError(dialog_id)

    def advance(self, now: float) -> None:
        """Run all tasks scheduled at or before ``now``."""
        while self._heap and self._heap[0][0] <= now:
            t, _, inc_id, dlg_id = heapq.heappop(self._heap)
            inc = self.incidents[inc_id]
            if dlg_id is None:
                # firing-timeout probe: extinguish when no firing
                # notification arrived within the horizon
                # (RamenAlerter.ml Stop Timeout)
                if (
                    self.pending.get(inc.name) == inc_id
                    and inc.timeout > 0
                    and t - inc.last_firing >= inc.timeout - 1e-9
                ):
                    self._log(inc, t, "Stop Timeout")
                    for d_id, d in inc.dialogs.items():
                        if d.status == START_TO_BE_SENT:
                            d.status = START_TO_BE_SENT_THEN_STOPPED
                        elif d.status in (START_SENT, START_ACKED):
                            d.status = STOP_TO_BE_SENT
                            d.attempts = 0
                            d.send_time = t
                            self._schedule(t, inc.id, d_id)
                    del self.pending[inc.name]
                continue
            if (
                self.max_incident_age is not None
                and t - inc.first_start["sent_time"] > self.max_incident_age
            ):
                # incident too old: cancel outstanding work
                # (RamenAlerter.ml:873-880)
                self._log(inc, t, "Cancelled (too old)")
                self.pending.pop(inc.name, None)
                inc.dialogs.pop(dlg_id, None)
                continue
            dlg = inc.dialogs.get(dlg_id)
            if dlg is None:
                continue
            contact = self._contact(inc, dlg_id)
            if dlg.status in (START_TO_BE_SENT, STOP_TO_BE_SENT):
                if dlg.send_time is not None and dlg.send_time > now:
                    self._schedule(dlg.send_time, inc_id, dlg_id)
                    continue
                is_start = dlg.status == START_TO_BE_SENT
                if contact.via is not None:
                    contact.via(inc_id, dlg_id, is_start, inc.first_start)
                dlg.attempts += 1
                self._log(
                    inc, t,
                    f"Sent {_ordinal(dlg.attempts)} message via {dlg_id}",
                )
                dlg.status = START_SENT if is_start else STOP_SENT
                if contact.timeout > 0:
                    self._schedule(t + contact.timeout, inc_id, dlg_id)
            elif dlg.status == START_SENT and contact.timeout > 0:
                # no ack in time → resend (RamenAlerter.ml:919-937)
                dlg.status = START_TO_BE_SENT
                dlg.send_time = t
                self._schedule(t, inc_id, dlg_id)
            elif dlg.status == START_TO_BE_SENT_THEN_STOPPED:
                # cancelled before the first send: nothing to deliver
                pass
            # StartAcked / StopSent: dialog settled

    # -- views -------------------------------------------------------------

    def group_outage(
        self, incident_ids: list[str], outage_id: str | None = None
    ) -> str:
        """Manually group incidents into one outage
        (RamenAlerter.ml:41-43: by default every incident is its own
        outage; grouping documents a shared root cause and has no
        effect on delivery). Returns the outage id (defaults to the
        first incident's)."""
        if not incident_ids:
            raise ValueError("group_outage: no incidents")
        oid = outage_id or incident_ids[0]
        for i in incident_ids:
            self.incidents[i].outage = oid
        return oid

    def outages(self) -> dict[str, list[str]]:
        """outage id → member incident ids."""
        out: dict[str, list[str]] = {}
        for i, inc in self.incidents.items():
            out.setdefault(inc.outage or i, []).append(i)
        return out

    def journal(self, inc_id: str) -> list[tuple[float, str]]:
        return list(self.incidents[inc_id].journal)


def alerter_sink(
    notifications,
    alerter: Alerter,
    time_col: str = "sent_time",
    firing_col: str | None = "firing",
    checkpoint: str | None = None,
):
    """Attach an ``Alerter`` to a (streaming) notification frame
    (schema: notification, parameters[, sent_time, firing]) — the
    NOTIFY → alerter ringbuffer of the reference, on ``foreachBatch``.
    Rows feed the FSM in event-time order; the scheduler advances to
    each batch's max event time. Batch frames replay identically and
    return None."""

    def deliver(batch_df, _epoch: int) -> None:
        cols = batch_df.columns
        rows = sorted(
            (r.asDict() for r in batch_df.toLocalIterator()),
            key=lambda r: r.get(time_col, 0.0) or 0.0,
        )
        last_t = None
        for r in rows:
            t = float(r.get(time_col, 0.0) or 0.0)
            # run scheduled tasks due before this notification, so the
            # FSM sees the same interleaving as the live daemon
            alerter.advance(t)
            alerter.notify(
                t,
                r["notification"],
                firing=bool(r[firing_col]) if firing_col in cols else True,
                parameters=dict(r.get("parameters") or {}),
            )
            last_t = t
        if last_t is not None:
            alerter.advance(last_t)

    if not notifications.isStreaming:
        deliver(notifications, -1)
        return None
    writer = notifications.writeStream.foreachBatch(deliver).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


# ---------------------------------------------------------------------------
# Contact transports (RamenAlerter.ml:560-665 contact kinds)
# ---------------------------------------------------------------------------
#
# The reference delivers messages via Ignore / Exec / SysLog / Sqlite /
# Kafka contacts, each expanding a message template with the incident's
# substitution dict (RamenStringExpansion.subst_dict — ``${var}`` with
# optional |filters). The constructors below build ``Contact.via``
# callables with the same contract; Kafka is env-gated (no client in
# this container) and raises a pointed error when constructed strictly.


class UndefVar(KeyError):
    """A template referenced ``${var}`` with no binding and no null
    default (RamenStringExpansion.UndefVar)."""


def subst_template(text: str, dict_: dict, null: str | None = None) -> str:
    """``${var}`` substitution with the reference's common filters
    (RamenStringExpansion.subst_dict): ``|shell`` single-quote escape,
    ``|sql`` quote doubling, ``|json`` string escape, ``|int``
    truncation, ``|date`` epoch → ISO local time. Bare numeric
    "variables" substitute themselves; an unbound variable raises
    UndefVar unless ``null`` supplies a default."""
    import json as _json
    import re as _re
    import time as _time

    def repl(m: "_re.Match[str]") -> str:
        spec = m.group(1)
        parts = [p.strip() for p in spec.split("|")]
        var, filters = parts[0], parts[1:]
        if var in dict_:
            v = dict_[var]
            v = "" if v is None else str(v)
        else:
            try:
                float(var)
                v = var
            except ValueError:
                if null is None:
                    raise UndefVar(var)
                v = null
        for f_ in filters:
            if f_ == "shell":
                v = v.replace("'", "'\\''")
            elif f_ == "sql":
                v = v.replace("'", "''")
            elif f_ == "json":
                v = _json.dumps(v)[1:-1]
            elif f_ == "int":
                v = str(int(float(v)))
            elif f_ == "date":
                v = _time.strftime(
                    "%Y-%m-%d %H:%M:%S", _time.localtime(float(v))
                )
        return v

    return _re.sub(r"\$\{([^}]*)\}", repl, text)


def _subst_dict(
    incident_id: str, is_start: bool, first_start: dict, now: float
) -> dict:
    """The delivery-time substitution dict (RamenAlerter.ml:724-758
    contact_via): built-ins first, notification parameters overriding
    them, ``timed-out`` on non-firing deliveries."""
    import os as _os

    d = {
        "name": first_start.get("name"),
        "incident_id": incident_id,
        "start": first_start.get("sent_time"),
        "now": now,
        "site": first_start.get("site", ""),
        "worker": first_start.get("worker", ""),
        "test": str(bool(first_start.get("test"))).lower(),
        "firing": str(bool(is_start)).lower(),
        "certainty": first_start.get("certainty"),
        "hostname": _os.environ.get("HOSTNAME", "?HOSTNAME?"),
    }
    if not is_start:
        d["timed-out"] = "false"
    d.update(first_start.get("parameters") or {})
    return d


def ignore_contact(name: str, timeout: float = 0.0) -> Contact:
    """The Ignore contact kind: deliberately delivers nowhere
    (tests/alerter/basic.test uses it to observe pure FSM flow)."""
    return Contact(name=name, via=None, timeout=timeout)


def exec_contact(
    name: str, cmd_template: str, timeout: float = 0.0,
    _runner=None,
) -> Contact:
    """Exec contact: expand the command template and run it through the
    shell (RamenAlerter.execute_cmd; bounded concurrency there — here
    the alerter FSM is single-threaded so sends are naturally serial).
    A non-zero exit status raises, which the caller's retry/timeout
    logic then handles exactly like any failed delivery."""
    import subprocess
    import time as _time

    def via(incident_id, dialog_id, is_start, first_start):
        cmd = subst_template(
            cmd_template,
            _subst_dict(incident_id, is_start, first_start, _time.time()),
        )
        run = _runner or (
            lambda c: subprocess.run(c, shell=True, check=True)
        )
        run(cmd)

    return Contact(name=name, via=via, timeout=timeout)


def syslog_contact(
    name: str, text_template: str, timeout: float = 0.0
) -> Contact:
    """SysLog contact (RamenAlerter.log_str, LOG_ALERT level) via the
    platform syslog; raises on hosts without one, as the reference
    does ("No syslog on this host")."""
    import time as _time

    def via(incident_id, dialog_id, is_start, first_start):
        try:
            import syslog as _syslog
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("No syslog on this host") from e
        msg = subst_template(
            text_template,
            _subst_dict(incident_id, is_start, first_start, _time.time()),
        )
        _syslog.syslog(_syslog.LOG_ALERT, msg)

    return Contact(name=name, via=via, timeout=timeout)


def sqlite_contact(
    name: str,
    file: str,
    insert: str,
    create: str = "",
    timeout: float = 0.0,
) -> Contact:
    """Sqlite contact (RamenAlerter.sqllite_insert): expand and run the
    INSERT with |sql-escaped values; when it fails and a CREATE
    statement is configured, create the table then retry the insert —
    the reference's lazy-schema flow."""
    import sqlite3
    import time as _time

    def via(incident_id, dialog_id, is_start, first_start):
        q = subst_template(
            insert,
            _subst_dict(incident_id, is_start, first_start, _time.time()),
        )
        con = sqlite3.connect(file)
        try:
            try:
                con.execute(q)
            except sqlite3.OperationalError:
                if not create:
                    raise
                con.execute(create)
                con.execute(q)
            con.commit()
        finally:
            con.close()

    return Contact(name=name, via=via, timeout=timeout)


def kafka_contact(
    name: str,
    options: dict,
    topic: str,
    partition: int,
    text: str,
    timeout: float = 0.0,
) -> Contact:
    """Kafka contact (RamenAlerter.kafka_publish). Env-gated: no Kafka
    client library ships in this container, so construction raises with
    the exact dependency needed — the configuration surface and message
    templating are the reference's."""
    try:
        import confluent_kafka  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Kafka contact needs a Kafka client (confluent_kafka) in "
            "the environment; options/topic/partition/text follow "
            "alerting_contact.type"
        ) from e
    raise NotImplementedError("unreachable in this container")
