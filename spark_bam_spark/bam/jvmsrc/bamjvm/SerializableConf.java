package bamjvm;

import java.io.IOException;
import java.io.ObjectInputStream;
import java.io.ObjectOutputStream;
import java.io.Serializable;
import org.apache.hadoop.conf.Configuration;

/**
 * Java-serializable wrapper around a Hadoop {@link Configuration}
 * (Configuration itself is only Writable).  Carries the Spark session's
 * Hadoop conf — spark.hadoop.* overrides, fs.s3a credentials,
 * fs.defaultFS — from the driver to the executor-side readers, so the
 * source behaves identically on any configured Hadoop-compatible store
 * instead of silently reverting to {@code new Configuration()} defaults.
 */
final class SerializableConf implements Serializable {
    private static final long serialVersionUID = 1L;

    transient Configuration conf;

    SerializableConf(Configuration conf) {
        this.conf = conf;
    }

    /**
     * The active Spark session's Hadoop conf when one exists (executor
     * threads and bare-JVM tests have none — fall back to defaults).
     */
    static Configuration sessionHadoopConf() {
        try {
            return org.apache.spark.sql.SparkSession.active().sparkContext().hadoopConfiguration();
        } catch (Exception e) {
            // Scala surfaces undeclared checked exceptions (SparkException
            // on "no active session"), so catch Exception, not just
            // RuntimeException
            return new Configuration();
        }
    }

    private void writeObject(ObjectOutputStream out) throws IOException {
        out.defaultWriteObject();
        conf.write(out);
    }

    private void readObject(ObjectInputStream in) throws IOException, ClassNotFoundException {
        in.defaultReadObject();
        conf = new Configuration(false);
        conf.readFields(in);
    }
}
