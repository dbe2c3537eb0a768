"""Explicit schemas for the network-telemetry tables.

The reference trusts Parquet schema-on-read with by-convention column-name
constants (reference: netflow/FlowSchema.scala:3-58, dns/DNSSchema.scala:3-32,
proxy/ProxySchema.scala:6-43) — a documented source of runtime cast errors
(e.g. the Row(ibyt: Long) match at netflow/FlowWordCreation.scala:38).
We declare StructTypes and validate on read instead.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- flow (netflow) — reference: netflow/FlowSchema.scala:3-58 ---------------
FLOW_SCHEMA = T.StructType(
    [
        T.StructField("treceived", T.StringType()),
        T.StructField("tryear", T.IntegerType()),
        T.StructField("trmonth", T.IntegerType()),
        T.StructField("trday", T.IntegerType()),
        T.StructField("trhour", T.IntegerType()),
        T.StructField("trminute", T.IntegerType()),
        T.StructField("trsec", T.IntegerType()),
        T.StructField("tdur", T.DoubleType()),
        T.StructField("sip", T.StringType()),
        T.StructField("dip", T.StringType()),
        T.StructField("sport", T.IntegerType()),
        T.StructField("dport", T.IntegerType()),
        T.StructField("proto", T.StringType()),
        T.StructField("flag", T.StringType()),
        T.StructField("fwd", T.DoubleType()),
        T.StructField("stos", T.DoubleType()),
        T.StructField("ipkt", T.LongType()),
        T.StructField("ibyt", T.LongType()),
        T.StructField("opkt", T.LongType()),
        T.StructField("obyt", T.LongType()),
        T.StructField("input", T.IntegerType()),
        T.StructField("output", T.IntegerType()),
        T.StructField("sas", T.StringType()),
        T.StructField("das", T.StringType()),
        T.StructField("dtos", T.StringType()),
        T.StructField("dir", T.StringType()),
        T.StructField("rip", T.StringType()),
    ]
)

# --- dns — reference: dns/DNSSchema.scala:3-32 -------------------------------
DNS_SCHEMA = T.StructType(
    [
        T.StructField("frame_time", T.StringType()),
        T.StructField("unix_tstamp", T.LongType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("ip_dst", T.StringType()),
        T.StructField("ip_src", T.StringType()),
        T.StructField("dns_qry_name", T.StringType()),
        T.StructField("dns_qry_class", T.StringType()),
        T.StructField("dns_qry_type", T.IntegerType()),
        T.StructField("dns_qry_rcode", T.IntegerType()),
        T.StructField("dns_a", T.StringType()),
    ]
)

# --- proxy — reference: proxy/ProxySchema.scala:6-43 -------------------------
PROXY_SCHEMA = T.StructType(
    [
        T.StructField("p_date", T.StringType()),
        T.StructField("p_time", T.StringType()),
        T.StructField("clientip", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("reqmethod", T.StringType()),
        T.StructField("useragent", T.StringType()),
        T.StructField("resconttype", T.StringType()),
        T.StructField("duration", T.IntegerType()),
        T.StructField("username", T.StringType()),
        T.StructField("authgroup", T.StringType()),
        T.StructField("exceptionid", T.StringType()),
        T.StructField("filterresult", T.StringType()),
        T.StructField("webcat", T.StringType()),
        T.StructField("referer", T.StringType()),
        T.StructField("respcode", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("urischeme", T.StringType()),
        T.StructField("uriport", T.StringType()),
        T.StructField("uripath", T.StringType()),
        T.StructField("uriquery", T.StringType()),
        T.StructField("uriextension", T.StringType()),
        T.StructField("serverip", T.StringType()),
        T.StructField("scbytes", T.IntegerType()),
        T.StructField("csbytes", T.IntegerType()),
        T.StructField("virusid", T.StringType()),
        T.StructField("bcappname", T.StringType()),
        T.StructField("bcappoper", T.StringType()),
        T.StructField("fulluri", T.StringType()),
    ]
)

# --- analyst feedback TSVs — reference: netflow/FlowPreLDA.scala:32-54,
#     dns/DNSPreLDA.scala:29-55, proxy/ProxyFeedback.scala:28-37 -------------
FLOW_FEEDBACK_COLUMNS = [
    "sev", "tstart", "srcIP", "dstIP", "sport", "dport", "proto", "flag",
    "ipkt", "ibyt", "lda_score", "rank", "srcIpInternal", "destIpInternal",
    "srcGeo", "dstGeo", "srcDomain", "dstDomain", "srcIP_rep", "dstIP_rep",
    "gti_srcIP_rep", "gti_dstIP_rep",
]

DNS_FEEDBACK_COLUMNS = [
    "frame_time", "frame_len", "ip_dst", "dns_qry_name", "dns_qry_class",
    "dns_qry_type", "dns_qry_rcode", "domain", "subdomain", "subdomain_length",
    "num_periods", "subdomain_entropy", "top_domain", "word", "score",
    "query_rep", "hh", "ip_sev", "dns_sev", "dns_qry_class_name",
    "dns_qry_type_name", "dns_qry_rcode_name", "network_context", "unix_tstamp",
]

PROXY_FEEDBACK_COLUMNS = [
    "p_date", "p_time", "clientip", "host", "reqmethod", "useragent",
    "resconttype", "duration", "username", "webcat", "referer", "respcode",
    "uriport", "uripath", "uriquery", "serverip", "scbytes", "csbytes",
    "fulluri", "word", "score", "uri_rep", "uri_sev",
]
