package bamjvm;

import java.io.BufferedReader;
import java.io.IOException;
import java.io.InputStreamReader;
import java.io.UncheckedIOException;
import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.List;
import java.util.Map;
import java.util.TreeMap;
import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.streaming.CompositeReadLimit;
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream;
import org.apache.spark.sql.connector.read.streaming.Offset;
import org.apache.spark.sql.connector.read.streaming.ReadLimit;
import org.apache.spark.sql.connector.read.streaming.ReadMaxBytes;
import org.apache.spark.sql.connector.read.streaming.ReadMaxFiles;
import org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow;
import org.slf4j.Logger;
import org.slf4j.LoggerFactory;

/**
 * Structured Streaming source over a landing directory of BAM files:
 * each micro-batch ingests the .bam files that appeared since the last
 * batch, planned through the SAME per-file splitter, pushdown, and
 * reader factory as the batch scan (BamDataSource.BamScan) — so a
 * streaming ingest pipeline gets identical rows, pruning, and locality
 * hints to a batch read of the same files.
 *
 * Offsets are a MONOTONIC BATCH ID; the files of each batch live in a
 * checkpointed metadata log ({@code <checkpoint>/bam-file-log/<batchId>},
 * one percent-encoded name per line, written atomically via temp+rename)
 * — the design of Spark's own FileStreamSource.  The offset the driver
 * checkpoints every trigger is O(1) regardless of how many files the
 * stream has ever seen (a 100 TB landing zone is 10^5–10^6 files; the
 * r10 name-set offset serialized all of them into every offset JSON),
 * while replay determinism is preserved: {@code planInputPartitions(a,b)}
 * re-reads log entries a+1..b, so a restart re-plans exactly the files
 * of the uncommitted batch.  On construction the log is replayed to
 * rebuild the seen-file set (O(total files) memory, the same bound as
 * FileStreamSource's seen map) and the highest batch id — a log entry
 * written by a failed trigger is thereby honored, not re-discovered.
 * Every COMPACT_INTERVAL committed batches the per-batch entries fold
 * into one ".compact" file (see {@link #commit}), so a long-lived
 * stream's log stays O(files) bytes in O(1 + recent) log files instead
 * of one file per batch forever.
 *
 * Files are ingested WHOLE once they appear: the lister only matches
 * "*.bam", and this engine's own writer lands files as
 * ".part-N.bam.inprogress" renamed atomically on commit, so a torn file
 * is never visible.  A file deleted between listing and planning is
 * skipped instead of failing the query.
 *
 * The reference has no streaming surface; this is Spark-first added
 * value on the format layer (its batch loadReads is the analogue —
 * load/.../CanLoadBam.scala, cited as behavior).
 */
final class BamMicroBatchStream implements MicroBatchStream, SupportsTriggerAvailableNow {
    /** Fold per-batch log entries into one ".compact" file every N
     *  committed batches (FileStreamSource's compactInterval analogue):
     *  a long-lived stream otherwise accumulates one tiny log file per
     *  batch and restart replays all of them. */
    static final int COMPACT_INTERVAL = 10;

    private static final Logger LOG = LoggerFactory.getLogger(BamMicroBatchStream.class);

    private final BamDataSource.BamScan scan;
    private final Path logDir;
    private long batchId; // highest batch with a log entry (0 = none)
    // name -> modification time at first sight (-1 = unknown, pre-r11 log)
    private final java.util.HashMap<String, Long> seen = new java.util.HashMap<>();
    // FileStreamSource's maxFileAge analogue (option max_file_age_ms,
    // default OFF): files older than (newest mtime seen - age) are
    // ignored at listing AND evicted from the seen map, bounding its
    // memory on an eternally-growing landing zone.  Same documented
    // caveat as FileStreamSource: a file whose mtime is bumped after
    // eviction is re-ingested.
    private final long maxAgeMs;
    // FileStreamSource's maxFilesPerTrigger analogue (option
    // max_files_per_batch, default OFF): cap how many unseen files one
    // micro-batch plans, oldest mtime first (name-tiebreak for
    // determinism).  A burst landing of 10^4 files then drains as
    // ceil(n/cap) individually-checkpointed batches instead of one giant
    // batch whose single failure re-plans everything.  Deferred files
    // stay un-seen and are picked up by subsequent latestOffset calls.
    // Caveat (shared with FileStreamSource): combined with
    // max_file_age_ms, a backlog deferred past the age window is dropped.
    private final int maxFilesPerBatch;
    // FileStreamSource's maxBytesPerTrigger analogue (option
    // max_bytes_per_batch, default OFF): cap a micro-batch's total INPUT
    // VOLUME, oldest (mtime, name) first — the knob that matters when a
    // burst is few huge files rather than many small ones.  Strict with
    // a progress guarantee: a batch never exceeds the budget unless a
    // SINGLE file alone does (that file is admitted by itself, so the
    // stream always advances).  Mutually composable with
    // max_files_per_batch (both caps apply).
    private final long maxBytesPerBatch;
    private long watermark = Long.MIN_VALUE; // newest mtime ever seen
    // non-null only under Trigger.AvailableNow: the backlog snapshot
    // (name -> {mtime, size}) taken at prepareForTriggerAvailableNow
    // (files landing later wait for the next trigger, so the drain
    // terminates)
    private TreeMap<String, long[]> availableNowSnapshot;

    BamMicroBatchStream(BamDataSource.BamScan scan, String checkpointLocation) {
        this.scan = scan;
        this.logDir = new Path(checkpointLocation, "bam-file-log");
        String age = scan.rawOption("max_file_age_ms");
        try {
            this.maxAgeMs = age == null ? -1 : Long.parseLong(age);
        } catch (NumberFormatException e) {
            throw new IllegalArgumentException(
                    "bam stream: max_file_age_ms must be a positive integer, got " + age);
        }
        if (age != null && this.maxAgeMs <= 0) {
            throw new IllegalArgumentException(
                    "bam stream: max_file_age_ms must be positive, got " + age);
        }
        String cap = scan.rawOption("max_files_per_batch");
        try {
            this.maxFilesPerBatch = cap == null ? -1 : Integer.parseInt(cap);
        } catch (NumberFormatException e) {
            throw new IllegalArgumentException(
                    "bam stream: max_files_per_batch must be a positive integer, got " + cap);
        }
        if (cap != null && this.maxFilesPerBatch <= 0) {
            throw new IllegalArgumentException(
                    "bam stream: max_files_per_batch must be positive, got " + cap);
        }
        String bytesCap = scan.rawOption("max_bytes_per_batch");
        try {
            this.maxBytesPerBatch = bytesCap == null ? -1 : Long.parseLong(bytesCap);
        } catch (NumberFormatException e) {
            throw new IllegalArgumentException(
                    "bam stream: max_bytes_per_batch must be a positive integer, got " + bytesCap);
        }
        if (bytesCap != null && this.maxBytesPerBatch <= 0) {
            throw new IllegalArgumentException(
                    "bam stream: max_bytes_per_batch must be positive, got " + bytesCap);
        }
        try {
            restoreLog();
        } catch (IOException e) {
            throw new UncheckedIOException(e);
        }
    }

    /** Monotonic batch id. */
    static final class BatchOffset extends Offset {
        final long batchId;

        BatchOffset(long batchId) {
            this.batchId = batchId;
        }

        @Override
        public String json() {
            return "{\"batchId\":" + batchId + "}";
        }

        static BatchOffset parse(String json) {
            // strict: only the {"batchId":N} shape this class writes is
            // accepted.  A legacy r10 name-set offset (or any corrupt
            // JSON) must fail the restart loudly — a lenient digit-scrape
            // would turn it into a garbage batch id and the stream would
            // run "healthily" forever while ingesting nothing.
            java.util.regex.Matcher m = java.util.regex.Pattern
                    .compile("^\\s*\\{\\s*\"batchId\"\\s*:\\s*(\\d+)\\s*\\}\\s*$")
                    .matcher(json);
            if (!m.matches()) {
                throw new IllegalArgumentException(
                        "bam stream: unrecognized offset " + json + " — expected"
                                + " {\"batchId\":N}; a checkpoint from the pre-batch-id"
                                + " offset format must be restarted fresh");
            }
            return new BatchOffset(Long.parseLong(m.group(1)));
        }
    }

    // ------------------------------------------------------- metadata log

    /** Percent-encode '%' and control characters so any legal file name
     *  survives the line-per-name log format. */
    static String encodeName(String name) {
        StringBuilder sb = new StringBuilder(name.length());
        for (int i = 0; i < name.length(); i++) {
            char c = name.charAt(i);
            if (c == '%' || c < 0x20 || c == 0x7F) {
                sb.append('%').append(String.format("%02X", (int) c));
            } else {
                sb.append(c);
            }
        }
        return sb.toString();
    }

    static String decodeName(String enc) {
        if (enc.indexOf('%') < 0) {
            return enc;
        }
        StringBuilder sb = new StringBuilder(enc.length());
        for (int i = 0; i < enc.length(); i++) {
            char c = enc.charAt(i);
            if (c == '%' && i + 2 < enc.length()) {
                sb.append((char) Integer.parseInt(enc.substring(i + 1, i + 3), 16));
                i += 2;
            } else {
                sb.append(c);
            }
        }
        return sb.toString();
    }

    private FileSystem logFs() throws IOException {
        return logDir.getFileSystem(scan.sconfConf());
    }

    /** Rebuild (batchId, seen, watermark) from the checkpointed log on
     *  (re)start: union of every ".compact" roll-up and per-batch entry
     *  present (set semantics make leftover overlap from a crashed
     *  compaction harmless); batchId = the highest id either kind
     *  records. */
    private void restoreLog() throws IOException {
        FileSystem lfs = logFs();
        if (!lfs.exists(logDir)) {
            return;
        }
        for (FileStatus f : lfs.listStatus(logDir)) {
            long id = logFileId(f.getPath().getName());
            if (id < 0) {
                continue; // .tmp leftovers from a crashed write
            }
            for (Map.Entry<String, Long> e : readLogEntries(lfs, f.getPath()).entrySet()) {
                seen.merge(e.getKey(), e.getValue(), Math::max);
                watermark = Math.max(watermark, e.getValue());
            }
            batchId = Math.max(batchId, id);
        }
    }

    /** Batch id of a log file name ("<n>" or "<n>.compact"); -1 for
     *  temp/unknown files. */
    static long logFileId(String name) {
        String digits = name.endsWith(".compact")
                ? name.substring(0, name.length() - ".compact".length())
                : name;
        try {
            return Long.parseLong(digits);
        } catch (NumberFormatException e) {
            return -1;
        }
    }

    private Map<String, Long> readBatchLog(FileSystem lfs, long id) throws IOException {
        return readLogEntries(lfs, new Path(logDir, Long.toString(id)));
    }

    /** One log line per file: "encodedName\tmtime" (tab is a control
     *  character, so an encoded name can never contain one); a line
     *  without the mtime field (pre-r11 log) restores as -1 = unknown,
     *  which the age filter never evicts. */
    private Map<String, Long> readLogEntries(FileSystem lfs, Path p) throws IOException {
        Map<String, Long> entries = new java.util.LinkedHashMap<>();
        try (BufferedReader r = new BufferedReader(
                new InputStreamReader(lfs.open(p), StandardCharsets.UTF_8))) {
            String line;
            while ((line = r.readLine()) != null) {
                if (line.isEmpty()) {
                    continue;
                }
                int tab = line.indexOf('\t');
                if (tab < 0) {
                    entries.put(decodeName(line), -1L);
                } else {
                    entries.put(decodeName(line.substring(0, tab)),
                            Long.parseLong(line.substring(tab + 1)));
                }
            }
        }
        return entries;
    }

    private void writeBatchLog(FileSystem lfs, long id, Map<String, Long> entries)
            throws IOException {
        lfs.mkdirs(logDir);
        Path tmp = new Path(logDir, id + ".tmp");
        try (FSDataOutputStream o = lfs.create(tmp, true)) {
            for (Map.Entry<String, Long> e : entries.entrySet()) {
                o.write((encodeName(e.getKey()) + "\t" + e.getValue())
                        .getBytes(StandardCharsets.UTF_8));
                o.write('\n');
            }
        }
        Path fin = new Path(logDir, Long.toString(id));
        if (!lfs.rename(tmp, fin)) {
            throw new IOException("bam stream: rename " + tmp + " -> " + fin + " failed");
        }
    }

    // ------------------------------------------------------------- source

    private FileSystem fs() throws IOException {
        return scan.rootPath().getFileSystem(scan.sconfConf());
    }

    @Override
    public Offset initialOffset() {
        // batch 0 is empty; the first latestOffset() logs every file
        // already present as batch 1
        return new BatchOffset(0);
    }

    /** List the landing dir and return the unseen (age-eligible) files
     *  as name -> {mtime, size}, updating the mtime watermark and
     *  evicting aged-out seen entries. */
    private TreeMap<String, long[]> listFresh() throws IOException {
        List<FileStatus> listed = BamDataSource.BamScan.listBamFiles(fs(), scan.rootPath());
        long newest = watermark;
        for (FileStatus f : listed) {
            newest = Math.max(newest, f.getModificationTime());
        }
        // age cutoff relative to the NEWEST file seen (the
        // FileStreamSource convention — immune to clock skew between
        // the driver and the store)
        long cutoff = maxAgeMs < 0 ? Long.MIN_VALUE : newest - maxAgeMs;
        TreeMap<String, long[]> fresh = new TreeMap<>();
        for (FileStatus f : listed) {
            String name = f.getPath().getName();
            if (!seen.containsKey(name) && f.getModificationTime() >= cutoff) {
                fresh.put(name, new long[] {f.getModificationTime(), f.getLen()});
            }
        }
        watermark = newest;
        if (maxAgeMs >= 0) {
            // evict tracked names the listing filter would reject
            // anyway (recorded mtime below the cutoff) — bounds the
            // seen map to the age window; -1 (unknown, pre-r11 log)
            // is never evicted
            seen.values().removeIf(mt -> mt >= 0 && mt < cutoff);
        }
        return fresh;
    }

    @Override
    public void prepareForTriggerAvailableNow() {
        // Trigger.AvailableNow contract: snapshot the backlog once at
        // trigger time; latestOffset then serves (capped) batches from
        // the snapshot and stops advancing when it drains, so the query
        // terminates even while new files keep landing.
        try {
            availableNowSnapshot = listFresh();
        } catch (IOException e) {
            throw new UncheckedIOException(e);
        }
    }

    @Override
    public ReadLimit getDefaultReadLimit() {
        // Publish the per-source options through the SupportsAdmissionControl
        // contract so Spark's engine (and its composing triggers) see the
        // caps as first-class ReadLimits instead of a side-channel; Spark
        // hands this back into latestOffset(start, limit).
        boolean files = maxFilesPerBatch > 0;
        boolean bytes = maxBytesPerBatch > 0;
        if (files && bytes) {
            return ReadLimit.compositeLimit(new ReadLimit[] {
                ReadLimit.maxFiles(maxFilesPerBatch), ReadLimit.maxBytes(maxBytesPerBatch),
            });
        }
        if (files) {
            return ReadLimit.maxFiles(maxFilesPerBatch);
        }
        if (bytes) {
            return ReadLimit.maxBytes(maxBytesPerBatch);
        }
        return ReadLimit.allAvailable();
    }

    /** The smallest maxFiles bound a ReadLimit carries: ReadMaxFiles
     *  directly, the min over a CompositeReadLimit's members, -1 when the
     *  limit imposes no file-count bound (allAvailable / rows / bytes —
     *  rows and bytes are meaningless pre-scan for whole-file admission,
     *  the same stance as FileStreamSource). */
    private static int readLimitMaxFiles(ReadLimit limit) {
        if (limit instanceof ReadMaxFiles) {
            return ((ReadMaxFiles) limit).maxFiles();
        }
        if (limit instanceof CompositeReadLimit) {
            int min = -1;
            for (ReadLimit inner : ((CompositeReadLimit) limit).getReadLimits()) {
                int m = readLimitMaxFiles(inner);
                if (m > 0) {
                    min = min < 0 ? m : Math.min(min, m);
                }
            }
            return min;
        }
        return -1;
    }

    /** Byte twin of {@link #readLimitMaxFiles}: ReadMaxBytes directly,
     *  min over a CompositeReadLimit's members, -1 when unbounded. */
    private static long readLimitMaxBytes(ReadLimit limit) {
        if (limit instanceof ReadMaxBytes) {
            return ((ReadMaxBytes) limit).maxBytes();
        }
        if (limit instanceof CompositeReadLimit) {
            long min = -1;
            for (ReadLimit inner : ((CompositeReadLimit) limit).getReadLimits()) {
                long m = readLimitMaxBytes(inner);
                if (m > 0) {
                    min = min < 0 ? m : Math.min(min, m);
                }
            }
            return min;
        }
        return -1;
    }

    @Override
    public Offset latestOffset(Offset startOffset, ReadLimit limit) {
        // SupportsAdmissionControl entry point: honor BOTH the Spark-side
        // ReadLimit (normally our own getDefaultReadLimit echoed back, but
        // the engine may compose or substitute) and the source options —
        // the effective caps are the min of whichever are set.
        int sparkFiles = readLimitMaxFiles(limit);
        int capFiles = maxFilesPerBatch > 0 && sparkFiles > 0
                ? Math.min(maxFilesPerBatch, sparkFiles)
                : Math.max(maxFilesPerBatch, sparkFiles);
        long sparkBytes = readLimitMaxBytes(limit);
        long capBytes = maxBytesPerBatch > 0 && sparkBytes > 0
                ? Math.min(maxBytesPerBatch, sparkBytes)
                : Math.max(maxBytesPerBatch, sparkBytes);
        return nextBatch(capFiles, capBytes);
    }

    @Override
    public Offset latestOffset() {
        return nextBatch(maxFilesPerBatch, maxBytesPerBatch);
    }

    private Offset nextBatch(int capFiles, long capBytes) {
        try {
            TreeMap<String, long[]> fresh;
            if (availableNowSnapshot != null) {
                // availableNow: serve strictly from the trigger-time
                // snapshot, minus what earlier batches already took
                availableNowSnapshot.keySet().removeIf(seen::containsKey);
                fresh = new TreeMap<>(availableNowSnapshot);
            } else {
                fresh = listFresh();
            }
            if (fresh.isEmpty()) {
                return new BatchOffset(batchId);
            }
            long totalBytes = 0;
            for (long[] v : fresh.values()) {
                totalBytes += v[1];
            }
            if ((capFiles > 0 && fresh.size() > capFiles)
                    || (capBytes > 0 && totalBytes > capBytes)) {
                // admit the oldest by (mtime, name) until either cap
                // binds; the rest remain un-seen and form the following
                // batches.  Byte cap is strict with a progress
                // guarantee: only a file that alone exceeds the budget
                // may overshoot, and it rides alone.
                List<Map.Entry<String, long[]>> cand = new ArrayList<>(fresh.entrySet());
                cand.sort(java.util.Comparator
                        .comparingLong((Map.Entry<String, long[]> e) -> e.getValue()[0])
                        .thenComparing(Map.Entry::getKey));
                TreeMap<String, long[]> capped = new TreeMap<>();
                long bytes = 0;
                for (Map.Entry<String, long[]> e : cand) {
                    if (capFiles > 0 && capped.size() >= capFiles) {
                        break;
                    }
                    if (capBytes > 0 && !capped.isEmpty() && bytes + e.getValue()[1] > capBytes) {
                        break;
                    }
                    capped.put(e.getKey(), e.getValue());
                    bytes += e.getValue()[1];
                }
                fresh = capped;
            }
            Map<String, Long> mtimes = new java.util.LinkedHashMap<>();
            for (Map.Entry<String, long[]> e : fresh.entrySet()) {
                mtimes.put(e.getKey(), e.getValue()[0]);
            }
            writeBatchLog(logFs(), batchId + 1, mtimes);
            batchId++;
            seen.putAll(mtimes);
            return new BatchOffset(batchId);
        } catch (IOException e) {
            throw new UncheckedIOException(e);
        }
    }

    @Override
    public Offset deserializeOffset(String json) {
        return BatchOffset.parse(json);
    }

    @Override
    public InputPartition[] planInputPartitions(Offset start, Offset end) {
        long a = ((BatchOffset) start).batchId;
        long b = ((BatchOffset) end).batchId;
        try {
            FileSystem lfs = logFs();
            FileSystem fileSystem = fs();
            List<FileStatus> batch = new ArrayList<>();
            for (long id = a + 1; id <= b; id++) {
                for (String name : readBatchLog(lfs, id).keySet()) {
                    try {
                        batch.add(fileSystem.getFileStatus(
                                new Path(scan.rootPath(), name)));
                    } catch (java.io.FileNotFoundException missing) {
                        // deleted between listing and planning (or before a
                        // checkpoint replay): skip rather than fail the query
                    }
                }
            }
            return scan.planFiles(fileSystem, batch);
        } catch (IOException e) {
            throw new UncheckedIOException(e);
        }
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
        return scan.createReaderFactory();
    }

    /**
     * Compaction rides on the API contract: {@code commit(end)} means
     * Spark has durably processed every batch ≤ end and "will only
     * request offsets greater than end in the future", so per-batch
     * resolution is never needed again below that bound.  Every
     * COMPACT_INTERVAL committed batches, fold everything ≤ end into
     * one "<end>.compact" file (written atomically BEFORE the folded
     * sources are deleted — a crash at any point leaves a superset on
     * disk, and restore's set-union semantics absorb the overlap).
     * Compaction failure is logged-and-ignored: it is an optimization,
     * never a correctness dependency.
     */
    @Override
    public void commit(Offset end) {
        long bound = ((BatchOffset) end).batchId;
        if (bound <= 0 || bound % COMPACT_INTERVAL != 0) {
            return;
        }
        try {
            FileSystem lfs = logFs();
            Path compacted = new Path(logDir, bound + ".compact");
            if (!lfs.exists(logDir) || lfs.exists(compacted)) {
                return; // already compacted at this bound
            }
            TreeMap<String, Long> all = new TreeMap<>();
            List<Path> folded = new ArrayList<>();
            for (FileStatus f : lfs.listStatus(logDir)) {
                long id = logFileId(f.getPath().getName());
                if (id >= 0 && id <= bound) {
                    for (Map.Entry<String, Long> e : readLogEntries(lfs, f.getPath()).entrySet()) {
                        all.merge(e.getKey(), e.getValue(), Math::max);
                    }
                    folded.add(f.getPath());
                }
            }
            if (folded.isEmpty()) {
                return;
            }
            Path tmp = new Path(logDir, bound + ".compact.tmp");
            try (FSDataOutputStream o = lfs.create(tmp, true)) {
                for (Map.Entry<String, Long> e : all.entrySet()) {
                    o.write((encodeName(e.getKey()) + "\t" + e.getValue())
                            .getBytes(StandardCharsets.UTF_8));
                    o.write('\n');
                }
            }
            if (!lfs.rename(tmp, compacted)) {
                throw new IOException("bam stream: rename " + tmp + " -> " + compacted + " failed");
            }
            for (Path p : folded) {
                lfs.delete(p, false);
            }
        } catch (IOException e) {
            // best-effort: leave the per-batch files in place — but say
            // so: a persistently failing compaction (e.g. log-dir
            // permissions) otherwise grows restart-replay cost silently,
            // one log file per batch forever, with no operator signal.
            // Through slf4j (Spark's own logging), not stderr, so the
            // warning obeys the deployment's log configuration.
            LOG.warn("bam stream: log compaction failed (will retry next"
                    + " interval; per-batch files left in place)", e);
        }
    }

    @Override
    public void stop() {}
}
