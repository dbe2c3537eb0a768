"""Command-line entry point — argparse mirror of the reference CLI.

Reference: SuspiciousConnectsArgumentParser.scala:9-110 (scopt) dispatched by
SuspiciousConnects.scala:45-50 on --analysis {flow,dns,proxy}; shell wrapper
ml_ops.sh:5-36 supplies the same values. Defaults follow ml_ops.sh
(TOPIC_COUNT=20 at :67, DUPFACTOR=1000 at :49).

Usage:
    python -m oni_ml_spark.cli --analysis flow --input /path/day.parquet \
        --feedback /path/flow_scores.csv --dupfactor 1000 \
        --threshold 1e-20 --maxresults 20 --output /path/out
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="oni_ml_spark",
        description="Suspicious-connects analysis (flow | dns | proxy), Spark-native.",
    )
    p.add_argument("--analysis", required=True, choices=["flow", "dns", "proxy"],
                   help="which data source to analyze (SuspiciousConnects.scala:45-50)")
    p.add_argument("--input", required=True,
                   help="parquet path(s) for one day of data, comma-separated")
    p.add_argument("--output", required=True, help="output directory for the scored TSV")
    p.add_argument("--feedback", default=None,
                   help="analyst feedback TSV (severity-3 rows oversampled)")
    p.add_argument("--dupfactor", type=int, default=1000,
                   help="feedback oversampling factor (ml_ops.sh:49)")
    p.add_argument("--ldatopiccount", type=int, default=20,
                   help="LDA topic count (ml_ops.sh:67)")
    p.add_argument("--lda-alpha", type=float, default=2.5,
                   help="doc concentration (OniLDACWrapper.scala:83-84)")
    p.add_argument("--lda-maxiter", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--threshold", type=float, default=1.0,
                   help="max score to report (P4 predicate)")
    p.add_argument("--maxresults", type=int, default=-1,
                   help="bottom-K size; -1 = all below threshold")
    p.add_argument("--topdomains", default=None,
                   help="Alexa-style rank,domain CSV for the top-domain flag")
    def _one_char(s: str) -> str:
        # Spark's CSV writer requires a single-character sep; fail at parse
        # time, not after minutes of featurize+LDA
        if len(s) != 1:
            raise argparse.ArgumentTypeError(
                f"delimiter must be exactly one character, got {s!r}"
            )
        return s

    def _non_negative(s: str) -> int:
        v = int(s)
        if v < 0:
            raise argparse.ArgumentTypeError(f"must be >= 0, got {v}")
        return v

    p.add_argument("--delimiter", default="\t", type=_one_char,
                   help="output field delimiter, one character "
                        "(SuspiciousConnectsArgumentParser.scala:107)")
    p.add_argument("--max-count-per-word", type=_non_negative, default=10_000,
                   help="cap per-(doc,word) corpus counts before LDA; "
                        "0 = uncapped (adversarial hot-doc guard)")
    p.add_argument("--audit", action="store_true",
                   help="print per-stage row counts (input / suspicious) to "
                        "stderr as one JSON line — measured via df.observe "
                        "during the run's own jobs, no extra scans")
    p.add_argument("--single-file", action="store_true",
                   help="coalesce the TSV to one part file")
    p.add_argument("--approx-quantiles", action="store_true",
                   help="use approxQuantile sketches instead of exact discrete cuts")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from oni_ml_spark.io import load_top_domains, write_tsv
    from oni_ml_spark.session import get_spark
    from oni_ml_spark.transforms.feedback import load_feedback_tsv
    from oni_ml_spark import schemas

    spark = get_spark(f"suspicious_connects_{args.analysis}")
    df = spark.read.parquet(*args.input.split(","))

    audit = None
    if args.audit:
        from oni_ml_spark.plans.audit import PipelineAudit

        audit = PipelineAudit()
        df = audit.observe(df, "input")

    top_domains = (
        load_top_domains(spark, args.topdomains) if args.topdomains else []
    )

    feedback = None
    kwargs = dict(
        dup_factor=args.dupfactor,
        topic_count=args.ldatopiccount,
        doc_concentration=args.lda_alpha,
        threshold=args.threshold,
        top_k=args.maxresults,
        seed=args.seed,
        max_iter=args.lda_maxiter,
        exact_quantiles=not args.approx_quantiles,
        max_count_per_word=args.max_count_per_word or None,
    )

    if args.analysis == "flow":
        from oni_ml_spark.pipelines import flow as pipe

        if args.feedback:
            from oni_ml_spark.transforms.feedback import flow_feedback_to_raw

            feedback = flow_feedback_to_raw(
                load_feedback_tsv(spark, args.feedback, schemas.FLOW_FEEDBACK_COLUMNS)
            )
        result = pipe.run(df, feedback, **kwargs)
    elif args.analysis == "dns":
        from oni_ml_spark.pipelines import dns as pipe

        if args.feedback:
            feedback = load_feedback_tsv(spark, args.feedback, schemas.DNS_FEEDBACK_COLUMNS)
        result = pipe.run(df, feedback, top_domains=top_domains, **kwargs)
    else:
        from oni_ml_spark.pipelines import proxy as pipe

        if args.feedback:
            feedback = load_feedback_tsv(spark, args.feedback, schemas.PROXY_FEEDBACK_COLUMNS)
        result = pipe.run(df, feedback, top_domains=top_domains, **kwargs)

    suspicious = result.suspicious
    if audit is not None:
        suspicious = audit.observe(suspicious, "suspicious")
    write_tsv(
        suspicious, args.output,
        single_file=args.single_file, delimiter=args.delimiter,
    )
    if audit is not None:
        import json as _json
        import sys as _sys

        print("AUDIT " + _json.dumps(audit.report()), file=_sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
