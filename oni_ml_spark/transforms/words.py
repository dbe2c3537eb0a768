"""Word (categorical token) assembly for flow / dns / proxy records.

The "word" is the discretized event fed to the topic model. All assembly is
native concat/when expressions; numeric components keep the reference's exact
string renderings (SURVEY.md §7.4.5): flow renders bins as Scala Double
strings ("7.0", "333333.0" — FlowWordCreationTest.scala:29-30), dns/proxy
render bins as ints ("7").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from oni_ml_spark.transforms.quantiles import bin_expr
from oni_ml_spark.transforms.text import extract_domain, top_domain_expr
from oni_ml_spark.transforms.time import seconds_of_day


def _dbl_str(c: Column) -> Column:
    """Render an integral double the way Scala Double.toString does ("23.0")."""
    return c.cast("double").cast("string")


def flow_word_cols(
    sip: Column | str,
    dip: Column | str,
    sport: Column | str,
    dport: Column | str,
    time_bin: Column | str,
    ibyt_bin: Column | str,
    ipkt_bin: Column | str,
) -> dict[str, Column]:
    """Flow port/direction word logic — reference netflow/FlowWordCreation.scala:94-144
    (``adjustPort``), validated against the 14-case table in
    FlowWordCreationTest.scala:19-229.

    Returns columns: word_port (string), ip_pair, source_word, destination_word.

    Port cases (evaluated in reference precedence order):
      2: exactly one side <= 1024, neither 0   → port = min, lower side gets -1 prefix on the OTHER word
      3: both > 1024                           → 333333
      4: exactly one side 0                    → the nonzero port; the zero side's word gets -1
      1: otherwise (both <= 1024) — both 0 → 0 else 111111

    The reference's dead compare ``sourceIp != 0`` (String vs Int, always
    true — FlowWordCreation.scala:105) is replicated by its effective
    behavior: canonical pair is (min ip, max ip) lexicographically
    (SURVEY.md §7.4.6).
    """
    s_ip = F.col(sip) if isinstance(sip, str) else sip
    d_ip = F.col(dip) if isinstance(dip, str) else dip
    sp = (F.col(sport) if isinstance(sport, str) else sport).cast("int")
    dp = (F.col(dport) if isinstance(dport, str) else dport).cast("int")
    tb = F.col(time_bin) if isinstance(time_bin, str) else time_bin
    bb = F.col(ibyt_bin) if isinstance(ibyt_bin, str) else ibyt_bin
    pb = F.col(ipkt_bin) if isinstance(ipkt_bin, str) else ipkt_bin

    ip_pair = F.when(s_ip < d_ip, F.concat_ws(" ", s_ip, d_ip)).otherwise(
        F.concat_ws(" ", d_ip, s_ip)
    )

    min_p, max_p = F.least(dp, sp), F.greatest(dp, sp)
    case2 = ((dp <= 1024) | (sp <= 1024)) & ((dp > 1024) | (sp > 1024)) & (min_p != 0)
    case3 = (dp > 1024) & (sp > 1024)
    case4_d0 = (dp == 0) & (sp != 0)
    case4_s0 = (sp == 0) & (dp != 0)

    word_port = (
        F.when(case2, min_p.cast("double"))
        .when(case3, F.lit(333333.0))
        .when(case4_d0, sp.cast("double"))
        .when(case4_s0, dp.cast("double"))
        .otherwise(F.when(min_p == 0, max_p.cast("double")).otherwise(F.lit(111111.0)))
    )

    base_word = F.concat_ws("_", _dbl_str(word_port), _dbl_str(tb), _dbl_str(bb), _dbl_str(pb))

    # -1 prefix marks the "direction" endpoint (FlowWordCreation.scala:133-141).
    src_neg = (case2 & (sp < dp)) | (case4_d0 & ~case2)
    dst_neg = (case2 & (dp < sp)) | (case4_s0 & ~case2 & ~case4_d0)
    source_word = F.when(src_neg, F.concat(F.lit("-1_"), base_word)).otherwise(base_word)
    destination_word = F.when(dst_neg, F.concat(F.lit("-1_"), base_word)).otherwise(base_word)

    return {
        "word_port": _dbl_str(word_port),
        "ip_pair": ip_pair,
        "source_word": source_word,
        "destination_word": destination_word,
    }


def dns_word(
    top_domain: Column | str,
    frame_len_bin: Column | str,
    time_bin: Column | str,
    subdomain_len_bin: Column | str,
    entropy_bin: Column | str,
    periods_bin: Column | str,
    qry_type: Column | str,
    qry_rcode: Column | str,
) -> Column:
    """DNS word: topDomain_frameLenBin_timeBin_subdomLenBin_entropyBin_periodsBin_qtype_rcode
    (dns/DNSWordCreation.scala:215-236). Bins render as plain ints."""
    cols = [
        F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
        for c in (
            top_domain, frame_len_bin, time_bin, subdomain_len_bin,
            entropy_bin, periods_bin, qry_type, qry_rcode,
        )
    ]
    return F.concat_ws("_", *cols)


def proxy_word(
    host: Column | str,
    p_time: Column | str,
    reqmethod: Column | str,
    uri_entropy_bin: Column | str,
    resconttype: Column | str,
    agent_count_bin: Column | str,
    respcode: Column | str,
    *,
    time_cuts: list[float],
    top_domains: list[str],
    safelist: list[str] | None = None,
) -> Column:
    """Proxy word (proxy/ProxyWordCreation.scala:30-51):
    topDomain_timeBin_reqMethod_uriEntropyBin_topContentType_agentBin_respFirstChar.

    ``uri_entropy_bin`` and ``agent_count_bin`` are passed pre-binned (they
    need corpus-level cuts / counts); host→topDomain and time binning happen
    here natively.
    """
    h = F.col(host) if isinstance(host, str) else host
    t = F.col(p_time) if isinstance(p_time, str) else p_time
    rm = F.col(reqmethod) if isinstance(reqmethod, str) else reqmethod
    ct = F.col(resconttype) if isinstance(resconttype, str) else resconttype
    rc = F.col(respcode) if isinstance(respcode, str) else respcode
    eb = F.col(uri_entropy_bin) if isinstance(uri_entropy_bin, str) else uri_entropy_bin
    ab = F.col(agent_count_bin) if isinstance(agent_count_bin, str) else agent_count_bin

    td = top_domain_expr(extract_domain(h), top_domains, safelist)
    tb = bin_expr(seconds_of_day(t), time_cuts)
    return F.concat_ws(
        "_",
        td.cast("string"),
        tb.cast("string"),
        rm,
        eb.cast("string"),
        F.split(ct, "/").getItem(0),
        ab.cast("string"),
        F.substring(rc, 1, 1),
    )
