"""Deterministic synthetic WildFly-style log generator (FIXTURES.md F-7).

Produces the three log grammars the reference parses
(stream_parse_transactions.js:346-350,567-576,734-739):
  * soap_io logs — jbossId-framed XML with <accountNumber> (and the riskid
    <key>AccountNumber</key>/<value> variant)
  * server logs — EJB CommonTiming entry/exit and standard
    CommonTiming::Start/Stop pairs (BAF variants carry an acct block)
  * app logs — audit-trail sessions: auditTrailId link line, RequestTrace
    stopWatchList section, then <stopWatchList> XML with FIFO-matched
    repeated subservices

Alongside the files it returns the EXPECTED tx records, so parser tests are
golden end-to-end. Dirty cases are generated on purpose: empty [] logId,
exit-without-entry, entry-without-exit, acctnum arriving after the exit
(parked-record flush), non-numeric acctnum (rejected).

Everything is seeded & hash-free: record i's attributes derive from i.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

BASE_MS = 1_700_000_000_000  # epoch ms grid start


def _log_ts(ms: int) -> str:
    """Reference log format: 2020-01-07 10:00:02,669 (local = UTC here)."""
    import datetime

    dt = datetime.datetime.fromtimestamp(ms / 1000.0, tz=datetime.timezone.utc)
    return dt.strftime("%Y-%m-%d %H:%M:%S") + f",{ms % 1000:03d}"


def _iso_ts(ms: int) -> str:
    """Audit-trail ISO format with offset: 2020-01-07T10:00:01.959+00:00."""
    import datetime

    dt = datetime.datetime.fromtimestamp(ms / 1000.0, tz=datetime.timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{ms % 1000:03d}+00:00"


@dataclass
class GeneratedLogs:
    files: dict[str, list[str]] = field(default_factory=dict)  # path -> lines
    expected: list[dict] = field(default_factory=dict)

    def write(self, root: str) -> None:
        for rel, lines in self.files.items():
            path = os.path.join(root, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                f.write("\n".join(lines) + "\n")


def generate(servers: tuple[str, ...] = ("srva", "srvb"), n_per_kind: int = 20) -> GeneratedLogs:
    g = GeneratedLogs(files={}, expected=[])
    for si, server in enumerate(servers):
        app = []
        srv = []
        soap = []
        t = BASE_MS + si * 10_000_000

        for i in range(n_per_kind):
            logid = f"{server}-ct-{i}"
            service = f"svc{i % 5}"
            start = t + i * 5_000
            elapsed = 100 + (i * 37) % 900
            end = start + elapsed
            acct = 100000000 + i
            has_entry = i % 7 != 3        # entry-without-exit / exit-without-entry mix
            has_exit = i % 11 != 5
            baf = i % 4 == 1              # BAF acct block salvage (P9)
            soap_acct = i % 3 != 2        # SOAP-provided acct (P8/J2)
            late_soap = i % 6 == 4        # acct mapping arrives after the exit

            # soap_io frames carrying the acct number
            def soap_frame(when_ms: int) -> list[str]:
                lines = [
                    f"=== jbossId={logid} ts={_log_ts(when_ms)} IO=I",
                    "<soapenv:Envelope><soapenv:Body>",
                ]
                if i % 5 == 0:
                    # riskid variant: key/value pair
                    lines.append("<entry><key>AccountNumber</key>")
                    lines.append(f"<value>{acct}</value></entry>")
                elif i % 9 == 7:
                    lines.append("<accountNumber>notanumber</accountNumber>")  # rejected U9
                else:
                    lines.append(f"<accountNumber>{acct}</accountNumber>")
                lines.append("</soapenv:Body></soapenv:Envelope>")
                lines.append(f"=== jbossId={logid} ts={_log_ts(when_ms + 1)} IO=O")
                return lines

            if soap_acct and not late_soap:
                soap.extend(soap_frame(start - 50))

            if has_entry:
                srv.append(
                    f"[{logid}] {_log_ts(start)} thread-{i} INFO CommonTiming::Start "
                    f"{service} request begins"
                )
            if has_exit:
                prefix = f"[{logid}] {_log_ts(end)} thread-{i} "
                if baf:
                    prefix += f"[baf][x:y:{acct + 500}] "
                srv.append(
                    prefix + f"INFO CommonTiming::Stop {service} total time {elapsed}"
                )

            if soap_acct and late_soap:
                soap.extend(soap_frame(end + 20))

            if has_exit:  # exits emit (entry missing -> salvaged incomplete)
                expected_acct = None
                if soap_acct and not (i % 9 == 7):
                    expected_acct = acct
                elif baf:
                    expected_acct = acct + 500
                g.expected.append(
                    {
                        "server": server,
                        "service": service,
                        "logid": logid,
                        "acctnum": expected_acct,
                        "startts": start if has_entry else end - elapsed,
                        "endts": end,
                        "elapsed": elapsed,
                        "toplevel": "N",
                        "matched": "Y" if has_entry else "N",
                        "source": "ct",
                    }
                )

        # EJB CommonTiming pairs (service gets the S: prefix, toplevel Y)
        for i in range(n_per_kind):
            logid = f"{server}-ejb-{i}"
            service = f"ejbSvc{i % 4}"
            start = t + 400_000 + i * 4_000
            elapsed = 50 + (i * 53) % 400
            end = start + elapsed
            srv.append(
                f"[{logid}] {_log_ts(start)} thread-e{i} INFO [CommonTiming] "
                f"EJB intercept beginning call {service}"
            )
            srv.append(
                f"[{logid}] {_log_ts(end)} thread-e{i} INFO [CommonTiming] "
                f"EJB intercept total call {service} took ms {elapsed}"
            )
            g.expected.append(
                {
                    "server": server,
                    "service": f"S:{service}",
                    "logid": logid,
                    "acctnum": None,
                    "startts": start,
                    "endts": end,
                    "elapsed": elapsed,
                    "toplevel": "Y",
                    "matched": "Y",
                    "source": "ejb",
                }
            )

        # audit-trail sessions with FIFO-matched repeated subservices (P10)
        for i in range(max(2, n_per_kind // 4)):
            logid = f"{server}-at-{i}"
            autr = f"AUTR-{server}-{i}"
            t0 = t + 800_000 + i * 20_000
            app.append(f"[{logid}] {_log_ts(t0)} INFO auditTrailId={autr} op=begin")
            app.append(f"{_log_ts(t0 + 10)} INFO Audit Trail id : {autr}")
            subs = [f"Provider[p{i}]", "lookup", f"Provider[p{i}]"]  # dup FIFO case
            elapsed_list = [120 + 10 * j for j in range(len(subs))]
            app.append(": RequestTrace [stopWatchList=")
            for sub, el in zip(subs, elapsed_list):
                app.append(f"   {sub} :[{el} millis of elapsed time]")
            app.append("]")
            app.append("<stopWatchList>")
            cursor = t0 + 100
            for j, (sub, el) in enumerate(zip(subs, elapsed_list)):
                sstart = cursor + j * 1_000
                sstop = sstart + el
                app.append(
                    f"  <stopWatch><name>{sub}</name>"
                    f"<startTime>{_iso_ts(sstart)}</startTime>"
                    f"<stopTime>{_iso_ts(sstop)}</stopTime></stopWatch>"
                )
                norm = sub.replace("[", ":").replace("]", "")
                g.expected.append(
                    {
                        "server": server,
                        "service": norm,
                        "logid": logid,
                        "acctnum": None,
                        "startts": sstart,
                        "endts": sstop,
                        "elapsed": el,
                        "toplevel": "N",
                        "matched": "Y",
                        "source": "audit",
                    }
                )
            app.append("</stopWatchList>")

        g.files[f"logs/{server}/app01.log"] = app
        g.files[f"logs/{server}/server.log"] = srv
        g.files[f"logs/{server}/soap_io01.log"] = soap
    return g
