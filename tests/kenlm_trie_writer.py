"""Synthesizes KenLM trie-family ``.binary`` files for reader tests.

The native decoder reads KenLM's four trie model types directly
(``native/ctc_decoder/ngram_lm.cc:LoadKenlmTrie``); the only genuine
KenLM trie artifact available offline (reference
``ctc_decoder_with_lm/ctc-test-lm.binary``) is order 2, which has no
middle levels and therefore never exercises the bit-packed middle
records or the bhiksha offsets array. This writer builds higher-order
tries from an ARPA-style n-gram dict following the same layout spec the
reader implements (lm/trie.hh, lm/bhiksha.hh, lm/quantize.hh,
util/bit_packing.hh semantics, reverse-verified against the order-2
fixture), so the roundtrip tests pin every structural choice the reader
makes — bit widths, field order, next-pointer chopping, quant tables —
against an independent Python construction.

Only used by tests; not part of the framework API.
"""
import struct

# Exact leading block (magic + sanity struct) of a KenLM format-v5
# binary, captured from the KenLM-produced reference fixture.
SANITY = (b"mmap lm http://kheafield.com/code format version 5\n"
          b"\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x80?\x00\x00"
          b"\x00\xbf\x01\x00\x00\x00\xff\xff\xff\xff\x00\x00\x00\x00"
          b"\x01\x00\x00\x00\x00\x00\x00\x00")
assert len(SANITY) == 88

_M64 = (1 << 64) - 1


def murmur64a(data, seed=0):
    """util::MurmurHash64A — KenLM's vocab hash (seed 0)."""
    m = 0xc6a4a7935bd1e995
    r = 47
    h = (seed ^ (len(data) * m)) & _M64
    n = len(data) // 8
    for i in range(n):
        k = int.from_bytes(data[8 * i:8 * i + 8], "little")
        k = (k * m) & _M64
        k ^= k >> r
        k = (k * m) & _M64
        h ^= k
        h = (h * m) & _M64
    tail = data[8 * n:]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & _M64
    h ^= h >> r
    h = (h * m) & _M64
    h ^= h >> r
    return h


def required_bits(max_value):
    if not max_value:
        return 0
    ret = 1
    while True:
        max_value >>= 1
        if not max_value:
            return ret
        ret += 1


def chop_bits(max_offset, max_next, conf_bits):
    """lm/bhiksha.hh ChopBits: argmin of table cost minus inline savings."""
    required = required_bits(max_next)
    best, lowest = 0, None
    for chop in range(min(required, conf_bits) + 1):
        change = (max_next >> (required - chop)) * 64 - max_offset * chop
        if lowest is None or change < lowest:
            lowest, best = change, chop
    return best


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.bit = 0

    def write(self, value, bits):
        end = (self.bit + bits + 7) // 8 + 8  # +8 slack like BaseSize
        if len(self.buf) < end:
            self.buf.extend(b"\x00" * (end - len(self.buf)))
        off = self.bit
        byte, sh = off // 8, off % 8
        chunk = int.from_bytes(self.buf[byte:byte + 9], "little")
        chunk |= (value & ((1 << bits) - 1)) << sh
        self.buf[byte:byte + 9] = chunk.to_bytes(9, "little")
        self.bit += bits

    def sized(self, n_records, total_bits):
        """Final section bytes: ((1+entries)*total_bits+7)//8 + 8."""
        want = ((n_records * total_bits) + 7) // 8 + 8
        out = bytes(self.buf[:want]) + b"\x00" * (want - len(self.buf))
        return out


def _f32bits(value):
    return struct.unpack("<I", struct.pack("<f", value))[0]


def write_trie_binary(path, ngrams, order, quantized=False, arrayed=False,
                      prob_bits=8, backoff_bits=7, conf_bits=255):
    """Write a KenLM trie binary.

    ngrams: dict mapping word-string tuples -> (log10 prob, backoff).
    Must be suffix-closed (every k-gram's (k-1)-suffix present) — KenLM
    guarantees this by inserting blanks; corpus-windowed test data
    satisfies it naturally. Probs must be <= 0 (31-bit storage drops
    the sign like WriteNonPositiveFloat31).
    """
    grams = {k: {} for k in range(1, order + 1)}
    for words, (p, bo) in ngrams.items():
        assert p <= 0.0, (words, p)
        grams[len(words)][tuple(words)] = (float(p), float(bo))
    for k in range(2, order + 1):
        for g in grams[k]:
            assert g[1:] in grams[k - 1], ("not suffix-closed", g)

    words = sorted(w for (w,) in grams[1])
    assert "<unk>" in words
    hashed = sorted((murmur64a(w.encode()), w) for w in words
                    if w != "<unk>")
    ids = {"<unk>": 0}
    for i, (_, w) in enumerate(hashed):
        ids[w] = i + 1
    by_id = ["<unk>"] + [w for _, w in hashed]
    counts = [len(grams[k]) for k in range(1, order + 1)]

    # per-level entries sorted by reversed id tuple (parent order, then
    # the extending first word) + next pointers into the level below
    levels = {}
    for k in range(1, order + 1):
        ents = sorted(grams[k], key=lambda g: tuple(
            ids[w] for w in reversed(g)))
        levels[k] = ents
    nexts = {}  # level k -> list of first-child indices (len counts+1)
    for k in range(1, order):
        parent_pos = {g: i for i, g in enumerate(levels[k])}
        child_count = [0] * len(levels[k])
        for g in levels[k + 1]:
            child_count[parent_pos[g[1:]]] += 1
        cum, acc = [], 0
        for c in child_count:
            cum.append(acc)
            acc += c
        cum.append(acc)
        assert acc == counts[k]
        nexts[k] = cum

    out = bytearray()
    out += SANITY
    model_type = 2 + (1 if quantized else 0) + (2 if arrayed else 0)
    out += struct.pack("<B3xfiiI", order, 1.5, model_type, 1, 1)
    for c in counts:
        out += struct.pack("<Q", c)
    out += b"\x00" * (-len(out) % 8)

    # vocab: u64 hash count + sorted hashes, region 8*(counts[0]+1)
    out += struct.pack("<Q", len(hashed))
    for h, _ in hashed:
        out += struct.pack("<Q", h)
    out += b"\x00" * 8 * (counts[0] + 1 - 1 - len(hashed))

    # quant tables: exact-bin assignment (each distinct value gets its
    # own bin) so quantized scores reproduce the ARPA values exactly
    quant = {}
    if quantized:
        out += struct.pack("<BBB5x", 2, prob_bits, backoff_bits)
        for k in list(range(2, order)) + [order]:
            vals = sorted({p for p, _ in grams[k].values()})
            assert len(vals) <= (1 << prob_bits), "too many prob bins"
            table = vals + [vals[-1]] * ((1 << prob_bits) - len(vals))
            quant[(k, "p")] = {v: i for i, v in enumerate(vals)}
            out += struct.pack("<%df" % len(table), *table)
            if k == order:
                break
            bos = sorted({bo for _, bo in grams[k].values() if bo != 0.0})
            assert len(bos) <= (1 << backoff_bits) - 2, "too many bo bins"
            table = [-0.0, 0.0] + bos
            table += [table[-1]] * ((1 << backoff_bits) - len(table))
            quant[(k, "b")] = {v: i + 2 for i, v in enumerate(bos)}
            quant[(k, "b")][0.0] = 0  # kNoExtensionQuant
            out += struct.pack("<%df" % len(table), *table)

    # unigrams: (counts[0]+2) x {prob, backoff, next}
    for w in by_id:
        p, bo = grams[1][(w,)]
        out += struct.pack("<ffQ", p, bo, nexts[1][ids[w]]
                           if order >= 2 else 0)
    out += struct.pack("<ffQ", 0.0, 0.0, counts[1] if order >= 2 else 0)
    out += struct.pack("<ffQ", 0.0, 0.0, 0)

    word_bits = required_bits(counts[0])
    for k in range(2, order):
        max_next = counts[k]
        if arrayed:
            chopped = chop_bits(counts[k - 1] + 1, max_next, conf_bits)
            inline_bits = required_bits(max_next) - chopped
            table_n = (max_next >> inline_bits) + 1
            base = len(out)
            region = bytearray(8 * (1 + table_n) + 7)
            region[0] = 0  # bhiksha version
            region[1] = conf_bits if conf_bits < 256 else 255
            table_at = (-base % 8) + 8  # align8(base)+8, relative
            # offsets[h] = first record index whose next-high >= h
            table = [0] * table_n
            write_to = 1
            seq = [nexts[k][i] for i in range(counts[k - 1] + 1)]
            for i, v in enumerate(seq):
                enc = v >> inline_bits
                while write_to <= enc:
                    table[write_to] = i
                    write_to += 1
            for h, v in enumerate(table):
                region[table_at + 8 * h:table_at + 8 * h + 8] = \
                    struct.pack("<Q", v)
            out += region
        else:
            inline_bits = required_bits(max_next)
        qb = (prob_bits + backoff_bits) if quantized else 63
        total = word_bits + qb + inline_bits
        bw = _BitWriter()
        for i, g in enumerate(levels[k]):
            p, bo = grams[k][g]
            bw.write(ids[g[0]], word_bits)
            if quantized:
                bw.write(quant[(k, "p")][p], prob_bits)
                bw.write(quant[(k, "b")][bo], backoff_bits)
            else:
                bw.write(_f32bits(p) & 0x7FFFFFFF, 31)
                bw.write(_f32bits(bo), 32)
            bw.write(nexts[k][i] & ((1 << inline_bits) - 1), inline_bits)
        # terminal record: zero word/values + final next pointer
        bw.write(0, word_bits + qb)
        bw.write(counts[k] & ((1 << inline_bits) - 1), inline_bits)
        out += bw.sized(1 + counts[k - 1], total)

    # longest level
    pb = prob_bits if quantized else 31
    total = word_bits + pb
    bw = _BitWriter()
    for g in levels[order]:
        p, _ = grams[order][g]
        bw.write(ids[g[0]], word_bits)
        bw.write(quant[(order, "p")][p] if quantized
                 else _f32bits(p) & 0x7FFFFFFF, pb)
    bw.write(0, total)  # terminal slack record
    out += bw.sized(1 + counts[order - 1], total)

    for w in by_id:
        out += w.encode() + b"\x00"
    with open(path, "wb") as f:
        f.write(bytes(out))
    return counts
