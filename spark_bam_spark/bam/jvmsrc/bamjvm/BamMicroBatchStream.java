package bamjvm;

import java.io.BufferedReader;
import java.io.IOException;
import java.io.InputStreamReader;
import java.io.UncheckedIOException;
import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.HashSet;
import java.util.List;
import java.util.Set;
import java.util.TreeSet;
import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream;
import org.apache.spark.sql.connector.read.streaming.Offset;

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
final class BamMicroBatchStream implements MicroBatchStream {
    private final BamDataSource.BamScan scan;
    private final Path logDir;
    private long batchId; // highest batch with a log entry (0 = none)
    private final Set<String> seen = new HashSet<>();

    BamMicroBatchStream(BamDataSource.BamScan scan, String checkpointLocation) {
        this.scan = scan;
        this.logDir = new Path(checkpointLocation, "bam-file-log");
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
            StringBuilder digits = new StringBuilder();
            for (int i = 0; i < json.length(); i++) {
                char c = json.charAt(i);
                if (c >= '0' && c <= '9') {
                    digits.append(c);
                }
            }
            if (digits.length() == 0) {
                throw new IllegalArgumentException("bam stream: bad offset json " + json);
            }
            return new BatchOffset(Long.parseLong(digits.toString()));
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

    /** Rebuild (batchId, seen) from the checkpointed log on (re)start. */
    private void restoreLog() throws IOException {
        FileSystem lfs = logFs();
        if (!lfs.exists(logDir)) {
            return;
        }
        for (FileStatus f : lfs.listStatus(logDir)) {
            String name = f.getPath().getName();
            long id;
            try {
                id = Long.parseLong(name);
            } catch (NumberFormatException e) {
                continue; // .tmp leftovers from a crashed write
            }
            seen.addAll(readBatchLog(lfs, id));
            batchId = Math.max(batchId, id);
        }
    }

    private List<String> readBatchLog(FileSystem lfs, long id) throws IOException {
        List<String> names = new ArrayList<>();
        Path p = new Path(logDir, Long.toString(id));
        try (BufferedReader r = new BufferedReader(
                new InputStreamReader(lfs.open(p), StandardCharsets.UTF_8))) {
            String line;
            while ((line = r.readLine()) != null) {
                if (!line.isEmpty()) {
                    names.add(decodeName(line));
                }
            }
        }
        return names;
    }

    private void writeBatchLog(FileSystem lfs, long id, Iterable<String> names)
            throws IOException {
        lfs.mkdirs(logDir);
        Path tmp = new Path(logDir, id + ".tmp");
        try (FSDataOutputStream o = lfs.create(tmp, true)) {
            for (String n : names) {
                o.write(encodeName(n).getBytes(StandardCharsets.UTF_8));
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

    @Override
    public Offset latestOffset() {
        try {
            TreeSet<String> fresh = new TreeSet<>();
            for (FileStatus f : BamDataSource.BamScan.listBamFiles(fs(), scan.rootPath())) {
                String name = f.getPath().getName();
                if (!seen.contains(name)) {
                    fresh.add(name);
                }
            }
            if (fresh.isEmpty()) {
                return new BatchOffset(batchId);
            }
            writeBatchLog(logFs(), batchId + 1, fresh);
            batchId++;
            seen.addAll(fresh);
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
                for (String name : readBatchLog(lfs, id)) {
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

    @Override
    public void commit(Offset end) {}

    @Override
    public void stop() {}
}
