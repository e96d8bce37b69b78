package bamjvm;

import java.io.IOException;

/**
 * Eager record-boundary checker — the JVM twin of the engine's Python
 * checker (spark_bam_spark/bam/checker.py: _check_one /
 * check_record_start / find_record_start), itself a behavioral port of
 * the reference's eager checker and FindRecordStart
 * (check/.../eager/Checker.scala:26-128, FindRecordStart.scala:30-63;
 * cited, not copied).  Split workers use it to re-synchronize on the
 * first true record start inside their byte range.
 */
final class Checker {
    static final int DEFAULT_READS_TO_CHECK = 10;
    static final long DEFAULT_MAX_READ_SIZE = 100_000_000L;
    private static final int FIXED = 36;

    private Checker() {}

    private static boolean nameCharOk(int c) {
        return (c >= 0x21 && c <= 0x3F) || (c >= 0x41 && c <= 0x7E);
    }

    /**
     * Short-circuit validity check of one presumptive record at {@code o};
     * returns the next record's offset on success, -1 on any failure.
     * Checks run in the same order as the Python twin so accept/reject
     * decisions agree byte-for-byte.
     */
    static long checkOne(byte[] b, int n, int o, HeaderData hdr, long maxReadSize) {
        if (n - o < FIXED) {
            return -1;
        }
        int blockSize = Bgzf.i32(b, o);
        int refIdx = Bgzf.i32(b, o + 4);
        int pos = Bgzf.i32(b, o + 8);
        if (blockSize < 32 || (long) blockSize + 4 > maxReadSize) {
            return -1;
        }
        int nRefs = hdr.nRefs();
        if (refIdx < -1 || refIdx >= nRefs) {
            return -1;
        }
        if (pos < -1) {
            return -1;
        }
        // strictly greater-than: parity with the reference's PosChecker
        if (refIdx >= 0 && pos > hdr.lengths[refIdx]) {
            return -1;
        }
        int mateRef = Bgzf.i32(b, o + 24);
        int matePos = Bgzf.i32(b, o + 28);
        if (mateRef < -1 || mateRef >= nRefs) {
            return -1;
        }
        if (matePos < -1) {
            return -1;
        }
        if (mateRef >= 0 && matePos > hdr.lengths[mateRef]) {
            return -1;
        }
        int lName = b[o + 12] & 0xFF;
        if (lName <= 1) {
            return -1;
        }
        int nCigar = Bgzf.u16(b, o + 16);
        int flag = Bgzf.u16(b, o + 18);
        int lSeq = Bgzf.i32(b, o + 20);
        if (lSeq < 0) {
            return -1;
        }
        boolean unmapped = (flag & 0x4) != 0;
        if (!unmapped && (nCigar == 0 || lSeq == 0)) {
            return -1;
        }
        long implied = 32L + lName + 4L * nCigar + ((long) lSeq + 1) / 2 + lSeq;
        if (blockSize < implied) {
            return -1;
        }
        int nameStart = o + FIXED;
        if (nameStart + (long) lName <= n) {
            if (b[nameStart + lName - 1] != 0) {
                return -1;
            }
            for (int i = 0; i < lName - 1; i++) {
                if (!nameCharOk(b[nameStart + i] & 0xFF)) {
                    return -1;
                }
            }
        }
        long cigarStart = nameStart + (long) lName;
        if (nCigar > 0 && cigarStart + 4L * nCigar <= n) {
            for (int i = 0; i < nCigar; i++) {
                int v = Bgzf.i32(b, (int) cigarStart + 4 * i);
                if ((v & 0xF) > 8) {
                    return -1;
                }
            }
        }
        return o + 4L + blockSize;
    }

    /**
     * True iff {@code readsToCheck} consecutive records parse from
     * {@code o} (clean EOF short of the count is success; a record
     * extending past true EOF is failure).  The window is extended on
     * demand, mirroring the Python ensure-callback semantics.
     */
    static boolean checkRecordStart(
            BamWindow win, long o, HeaderData hdr, int readsToCheck, long maxReadSize)
            throws IOException {
        for (int k = 0; k < readsToCheck; k++) {
            win.ensure(o + FIXED);
            int n = win.len;
            if (o == n) {
                return true; // clean EOF
            }
            long nxt = checkOne(win.buf, n, (int) o, hdr, maxReadSize);
            if (nxt < 0) {
                return false;
            }
            if (nxt > n) {
                win.ensure(nxt);
                if (nxt > win.len) {
                    return false; // mid-record EOF
                }
                if (checkOne(win.buf, win.len, (int) o, hdr, maxReadSize) < 0) {
                    return false; // re-validate with the full bytes
                }
            }
            o = nxt;
        }
        return true;
    }

    /**
     * Probe successive offsets from {@code from} until the eager
     * predicate passes; the search horizon is captured from the window
     * length at entry (extensions during checking do not widen it).
     * Returns -1 when no record start is found.
     */
    static long findRecordStart(
            BamWindow win, int from, HeaderData hdr, int readsToCheck, long maxReadSize)
            throws IOException {
        long limit = Math.min((long) win.len, (long) from + DEFAULT_MAX_READ_SIZE);
        for (long cand = from; cand <= limit; cand++) {
            if (checkRecordStart(win, cand, hdr, readsToCheck, maxReadSize)) {
                return cand;
            }
        }
        return -1;
    }
}
