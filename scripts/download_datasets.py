#!/usr/bin/env python
"""Dataset / LM downloaders (reference `scripts/get_en_de.sh`,
`get_big_en-de_data.sh`, `obtain_datasets_lm.sh`, `download_lm.sh`,
`import_librivox.py` download step).

One CLI for the public corpora the example configs target. Downloads
need network egress — in an air-gapped environment each subcommand
fails with a clear message listing the URLs to mirror manually.

  python scripts/download_datasets.py wmt16_en_de --output_dir wmt16
  python scripts/download_datasets.py librispeech --output_dir LibriSpeech \
      --subsets train-clean-100 dev-clean
  python scripts/download_datasets.py wikitext --which 2
  python scripts/download_datasets.py openslr_lm --output_dir language_model
"""
from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.error
import urllib.request
import zipfile

_WMT16 = [
    ("http://www.statmt.org/europarl/v7/de-en.tgz",
     "europarl-v7-de-en.tgz"),
    ("http://www.statmt.org/wmt13/training-parallel-commoncrawl.tgz",
     "common-crawl.tgz"),
    ("http://data.statmt.org/wmt16/translation-task/"
     "training-parallel-nc-v11.tgz", "nc-v11.tgz"),
    ("http://data.statmt.org/wmt16/translation-task/dev.tgz", "dev.tgz"),
    ("http://data.statmt.org/wmt16/translation-task/test.tgz",
     "test.tgz"),
]
_LIBRISPEECH = "http://www.openslr.org/resources/12/{}.tar.gz"
_WIKITEXT = ("https://s3.amazonaws.com/research.metamind.io/wikitext/"
             "wikitext-{}-v1.zip")
_OPENSLR_LM = "http://www.openslr.org/resources/11/4-gram.arpa.gz"


def _fetch(url: str, dest: str):
    if os.path.exists(dest):
        print("exists, skipping: {}".format(dest))
        return dest
    print("downloading {} -> {}".format(url, dest))
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    try:
        urllib.request.urlretrieve(url, dest + ".part")
    except (urllib.error.URLError, OSError) as e:
        raise SystemExit(
            "download failed ({}). This environment may have no network "
            "egress — mirror the file manually:\n  {}".format(e, url))
    os.rename(dest + ".part", dest)
    return dest


def _extract(path: str, out_dir: str):
    print("extracting {}".format(path))
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            z.extractall(out_dir)
    else:
        with tarfile.open(path) as t:
            t.extractall(out_dir)


def wmt16_en_de(args):
    data = os.path.join(args.output_dir, "data")
    for url, name in _WMT16:
        _extract(_fetch(url, os.path.join(data, name)), data)
    print("Done. Tokenize with scripts/tokenizer_wrapper.py, then point "
          "example_configs/text2text/* data_layer_params at the files.")


def librispeech(args):
    for subset in args.subsets:
        path = _fetch(_LIBRISPEECH.format(subset),
                      os.path.join(args.output_dir,
                                   subset + ".tar.gz"))
        _extract(path, args.output_dir)
    print("Done. Build CSVs with scripts/import_librispeech.py.")


def wikitext(args):
    name = "wikitext-{}".format(args.which)
    path = _fetch(_WIKITEXT.format(args.which),
                  os.path.join(args.output_dir, name + "-v1.zip"))
    _extract(path, args.output_dir)
    print("Done. Point example_configs/lm/lstm_wkt2.py data_root at "
          "{}/{}.".format(args.output_dir, name))


def openslr_lm(args):
    import gzip
    import shutil
    gz = _fetch(_OPENSLR_LM,
                os.path.join(args.output_dir, "4-gram.arpa.gz"))
    arpa = os.path.join(args.output_dir, "4-gram.arpa")
    if not os.path.exists(arpa):
        with gzip.open(gz, "rb") as fin, open(arpa, "wb") as fout:
            shutil.copyfileobj(fin, fout)
    lower = os.path.join(args.output_dir, "4-gram-lower.arpa")
    if not os.path.exists(lower):
        with open(arpa, errors="replace") as fin, \
                open(lower, "w") as fout:
            for line in fin:
                fout.write(line.lower())
    print("Done. Use with decoders' ARPA scorer (lm_path) directly — "
          "no KenLM binary build needed.")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("wmt16_en_de")
    w.add_argument("--output_dir", default="wmt16_de_en")
    w.set_defaults(fn=wmt16_en_de)

    l = sub.add_parser("librispeech")
    l.add_argument("--output_dir", default="LibriSpeech")
    l.add_argument("--subsets", nargs="+",
                   default=["train-clean-100", "dev-clean", "test-clean"])
    l.set_defaults(fn=librispeech)

    k = sub.add_parser("wikitext")
    k.add_argument("--which", choices=["2", "103"], default="2")
    k.add_argument("--output_dir", default=".")
    k.set_defaults(fn=wikitext)

    o = sub.add_parser("openslr_lm")
    o.add_argument("--output_dir", default="language_model")
    o.set_defaults(fn=openslr_lm)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
