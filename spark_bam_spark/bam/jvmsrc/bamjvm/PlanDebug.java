package bamjvm;

import java.util.HashMap;
import java.util.Map;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Plan-only debug entry point: runs the full DSv2 planning pipeline
 * (table → scan builder → planInputPartitions) WITHOUT a Spark session
 * and prints each split's byte range and preferred locations — lets the
 * test suite assert the locality hints ({@code BamSplit.preferredLocations},
 * the analogue of the reference's SplitRDD.getPreferredLocations,
 * check/.../spark/SplitRDD.scala:27-30) from a plain JVM subprocess.
 *
 * Usage: java bamjvm.PlanDebug &lt;path&gt; [split_size]
 */
public final class PlanDebug {
    private PlanDebug() {}

    public static void main(String[] args) throws Exception {
        Map<String, String> props = new HashMap<>();
        props.put("path", args[0]);
        if (args.length > 1) {
            props.put("split_size", args[1]);
        }
        BamDataSource ds = new BamDataSource();
        Table t = ds.getTable(null, null, props);
        ScanBuilder sb = ((SupportsRead) t).newScanBuilder(new CaseInsensitiveStringMap(props));
        Scan scan = sb.build();
        InputPartition[] parts = scan.toBatch().planInputPartitions();
        System.out.println("splits=" + parts.length);
        for (InputPartition p : parts) {
            BamDataSource.BamSplit s = (BamDataSource.BamSplit) p;
            System.out.println(
                    "split start=" + s.start + " end=" + s.end
                    + " hosts=" + String.join(",", p.preferredLocations()));
        }
    }
}
