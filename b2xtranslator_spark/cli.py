"""Command-line front-ends mirroring the reference shells.

- ``doc2text in.doc [out.txt]``  (reference: Shell/doc2text/Program.cs:22-54)
- ``any2text in.{doc,xls,ppt} [out.txt]`` — format auto-dispatch
- ``pipeline --input <parquet> --output <dir> [--run-id r1]`` — the Spark job

Usage: ``python -m b2xtranslator_spark.cli doc2text samples/foo.doc``.
"""

from __future__ import annotations

import argparse
import sys


def _write_out(text: str, out_path: str | None) -> None:
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(text)
    else:
        sys.stdout.write(text + "\n")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="b2xtranslator_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for cmd in ("doc2text", "any2text"):
        p = sub.add_parser(cmd)
        p.add_argument("input")
        p.add_argument("output", nargs="?")
        p.add_argument(
            "--no-urls",
            action="store_true",
            help="drop hyperlink URLs (reference: CommandLineTranslator.ExtractUrls)",
        )

    p = sub.add_parser("pipeline")
    p.add_argument("--input", required=True, help="transcripts parquet path")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--run-id", default="run-1")
    p.add_argument("--groups", type=int, default=8)

    args = parser.parse_args(argv)

    if args.cmd == "doc2text":
        from .formats.word.extract import extract_doc_text

        payload = open(args.input, "rb").read()
        _write_out(extract_doc_text(payload, not args.no_urls), args.output)
        return 0

    if args.cmd == "any2text":
        from .extractors import extract_payload_text

        res = extract_payload_text(open(args.input, "rb").read(), not args.no_urls)
        if res.status != "ok":
            print(f"error ({res.status}): {res.error}", file=sys.stderr)
            return 1
        _write_out(res.text, args.output)
        return 0

    if args.cmd == "pipeline":
        from .pipeline import run_with_checkpoints
        from .plans.session import build_session

        spark = build_session(app_name="b2x-pipeline")
        stats = run_with_checkpoints(
            spark, args.input, args.output, args.run_id, n_groups=args.groups
        )
        print(stats)
        spark.stop()
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
