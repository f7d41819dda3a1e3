// Golden-output harness driving the UNMODIFIED reference engine at
// /root/reference (compiled separately to /tmp/refbin). Used only by
// tools/refgold/diffcheck.py and test-fixture generation -- never shipped,
// never part of the Spark engine.
//
// Modes:
//   stem   <words.txt> <out.tsv>            word -> Snowball-porter stem
//   index  <docsdir> <out.json>             in-memory positional index dump
//   bool   <docsdir> <queries.txt> <out.json>   M2 BooleanQueryParser results
//   ranked <docsdir> <queries.txt> <out.json>   M2 RankedQueryParser scores
//
// bool/ranked build the M2 on-disk index inside <docsdir> (must be a
// writable scratch copy). Doc ids are reported as FILE NAMES so the
// comparison is independent of filesystem walk order.

import engine.simple.Milestone1.PositionalIndex;
import engine.simple.Milestone1.PositionalPosting;
import engine.simple.Milestone1.SimpleEngine;
import engine.simple.Milestone2.BooleanQueryParser;
import engine.simple.Milestone2.DiskInvertedIndex;
import engine.simple.Milestone2.DiskPosting;
import engine.simple.Milestone2.IndexWriter;
import engine.simple.Milestone2.QueryFrame;
import engine.simple.Milestone2.RankedQueryParser;

import java.io.File;
import java.io.PrintStream;
import java.io.RandomAccessFile;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Path;
import java.nio.file.Paths;
import java.util.ArrayList;
import java.util.List;
import java.util.Map;
import java.util.PriorityQueue;

public class GoldGen {

    public static void main(String[] args) throws Exception {
        // silence the engine's per-file "Indexing file ..." chatter
        PrintStream realOut = System.out;
        System.setOut(new PrintStream(new java.io.OutputStream() {
            public void write(int b) {}
        }));
        try {
            switch (args[0]) {
                case "stem": stem(args[1], args[2]); break;
                case "index": dumpIndex(args[1], args[2]); break;
                case "bool": boolQueries(args[1], args[2], args[3]); break;
                case "ranked": rankedQueries(args[1], args[2], args[3]); break;
                case "tranked": tieredRankedQueries(args[1], args[2], args[3]); break;
                case "sranked": scoredRankedQueries(args[1], args[2], args[3]); break;
                default: throw new IllegalArgumentException(args[0]);
            }
        } finally {
            System.setOut(realOut);
        }
    }

    static void stem(String in, String out) throws Exception {
        StringBuilder sb = new StringBuilder();
        for (String w : Files.readAllLines(Paths.get(in), StandardCharsets.UTF_8)) {
            sb.append(w).append('\t').append(SimpleEngine.applyPorter2Stemmer(w)).append('\n');
        }
        Files.write(Paths.get(out), sb.toString().getBytes(StandardCharsets.UTF_8));
    }

    static void dumpIndex(String dir, String out) throws Exception {
        SimpleEngine se = new SimpleEngine();
        List<String> files = se.visitAllFiles(Paths.get(dir));
        PositionalIndex idx = se.getIndex();

        StringBuilder sb = new StringBuilder("{\n\"files\": [");
        for (int i = 0; i < files.size(); i++) {
            if (i > 0) sb.append(',');
            sb.append(jstr(files.get(i)));
        }
        sb.append("],\n\"doc_weight_bits\": [");
        RandomAccessFile dw = new RandomAccessFile(new File(dir, "docWeights.bin"), "r");
        for (int i = 0; i < files.size(); i++) {
            if (i > 0) sb.append(',');
            sb.append('"').append(Long.toUnsignedString(Double.doubleToLongBits(dw.readDouble()))).append('"');
        }
        dw.close();
        sb.append("],\n\"index\": {");
        String[] dict = idx.getDictionary();
        for (int t = 0; t < dict.length; t++) {
            if (t > 0) sb.append(',');
            sb.append('\n').append(jstr(dict[t])).append(": [");
            List<PositionalPosting> plist = idx.getPostings(dict[t]);
            for (int p = 0; p < plist.size(); p++) {
                if (p > 0) sb.append(',');
                PositionalPosting pp = plist.get(p);
                sb.append('[').append(pp.getDocId()).append(",[");
                ArrayList<Integer> pos = pp.getPositions();
                for (int q = 0; q < pos.size(); q++) {
                    if (q > 0) sb.append(',');
                    sb.append(pos.get(q));
                }
                sb.append("]]");
            }
            sb.append(']');
        }
        sb.append("}\n}\n");
        Files.write(Paths.get(out), sb.toString().getBytes(StandardCharsets.UTF_8));
    }

    static List<String> buildDisk(String dir) throws Exception {
        SimpleEngine se = new SimpleEngine();
        List<String> files = se.visitAllFiles(Paths.get(dir));
        new IndexWriter(dir).buildIndex(se.getIndex());
        QueryFrame.filenames = files.toArray(new String[0]);
        return files;
    }

    static void boolQueries(String dir, String queriesFile, String out) throws Exception {
        List<String> files = buildDisk(dir);
        DiskInvertedIndex dii = new DiskInvertedIndex(dir);
        StringBuilder sb = new StringBuilder("{\n\"files\": [");
        for (int i = 0; i < files.size(); i++) {
            if (i > 0) sb.append(',');
            sb.append(jstr(files.get(i)));
        }
        sb.append("],\n");
        List<String> queries = Files.readAllLines(Paths.get(queriesFile), StandardCharsets.UTF_8);
        for (int qi = 0; qi < queries.size(); qi++) {
            if (qi > 0) sb.append(",\n");
            // fresh parser per query: its OR-stack field starts empty, same
            // as the UI's reused instance after a completed parse
            BooleanQueryParser p = new BooleanQueryParser(dii);
            ArrayList<DiskPosting> r;
            boolean crashed = false;
            try {
                r = p.parseQuery(queries.get(qi), 0, false);
            } catch (RuntimeException e) {
                // the reference NPEs when a subquery's positives all
                // vanish in optimizeQuery (removeNotList(null, ...),
                // BooleanQueryParser.java:453) — record it as a crash
                r = null;
                crashed = true;
            }
            sb.append("\"q").append(qi).append("\": ");
            if (crashed) {
                sb.append("\"crash\"");
            } else if (r == null) {
                sb.append("null");
            } else {
                sb.append('[');
                for (int i = 0; i < r.size(); i++) {
                    if (i > 0) sb.append(',');
                    sb.append(jstr(files.get(r.get(i).getDocId())));
                }
                sb.append(']');
            }
        }
        sb.append("\n}\n");
        Files.write(Paths.get(out), sb.toString().getBytes(StandardCharsets.UTF_8));
    }

    static void rankedQueries(String dir, String queriesFile, String out) throws Exception {
        List<String> files = buildDisk(dir);
        DiskInvertedIndex dii = new DiskInvertedIndex(dir);
        StringBuilder sb = new StringBuilder("{\n\"files\": [");
        for (int i = 0; i < files.size(); i++) {
            if (i > 0) sb.append(',');
            sb.append(jstr(files.get(i)));
        }
        sb.append("],\n");
        List<String> queries = Files.readAllLines(Paths.get(queriesFile), StandardCharsets.UTF_8);
        for (int qi = 0; qi < queries.size(); qi++) {
            if (qi > 0) sb.append(",\n");
            RankedQueryParser rp = new RankedQueryParser(dii);
            // the UI lowercases+trims before ranked parse (QueryFrame.java:284)
            PriorityQueue<Map.Entry<Integer, Double>> pq =
                rp.parseQuery(queries.get(qi).toLowerCase().trim(), qi);
            sb.append("\"q").append(qi).append("\": {");
            boolean first = true;
            while (pq != null && !pq.isEmpty()) {
                Map.Entry<Integer, Double> e = pq.poll();
                if (!first) sb.append(',');
                first = false;
                sb.append(jstr(files.get(e.getKey()))).append(":\"")
                  .append(Long.toUnsignedString(Double.doubleToLongBits(e.getValue())))
                  .append('"');
            }
            sb.append('}');
        }
        sb.append("\n}\n");
        Files.write(Paths.get(out), sb.toString().getBytes(StandardCharsets.UTF_8));
    }

    static void tieredRankedQueries(String dir, String queriesFile, String out) throws Exception {
        // the ACTIVE configuration: TieredIndexWriter + TieredRankedQueryParser
        // (ModeOptionFrame.java:160-164, QueryFrame.java:287)
        SimpleEngine se = new SimpleEngine();
        List<String> files = se.visitAllFiles(Paths.get(dir));
        new engine.simple.Milestone3.TieredIndexWriter(dir).buildIndex(se.getIndex());
        QueryFrame.filenames = files.toArray(new String[0]);
        engine.simple.Milestone3.TieredDiskInvertedIndex tdii =
            new engine.simple.Milestone3.TieredDiskInvertedIndex(dir);
        StringBuilder sb = new StringBuilder("{\n\"files\": [");
        for (int i = 0; i < files.size(); i++) {
            if (i > 0) sb.append(',');
            sb.append(jstr(files.get(i)));
        }
        sb.append("],\n");
        List<String> queries = Files.readAllLines(Paths.get(queriesFile), StandardCharsets.UTF_8);
        for (int qi = 0; qi < queries.size(); qi++) {
            if (qi > 0) sb.append(",\n");
            engine.simple.Milestone3.TieredRankedQueryParser trp =
                new engine.simple.Milestone3.TieredRankedQueryParser(tdii);
            PriorityQueue<Map.Entry<Integer, Double>> pq =
                trp.parseQuery(queries.get(qi).toLowerCase().trim(), qi);
            sb.append("\"q").append(qi).append("\": {");
            boolean first = true;
            while (pq != null && !pq.isEmpty()) {
                Map.Entry<Integer, Double> e = pq.poll();
                if (!first) sb.append(',');
                first = false;
                sb.append(jstr(files.get(e.getKey()))).append(":\"")
                  .append(Long.toUnsignedString(Double.doubleToLongBits(e.getValue())))
                  .append('"');
            }
            sb.append('}');
        }
        sb.append("\n}\n");
        Files.write(Paths.get(out), sb.toString().getBytes(StandardCharsets.UTF_8));
    }

    static void scoredRankedQueries(String dir, String queriesFile, String out) throws Exception {
        // the inactive 'WithScore' variant: precomputed-score tiers
        // (TieredIndexWriterWithScore + TieredRankedQueryParserWithScore)
        SimpleEngine se = new SimpleEngine();
        List<String> files = se.visitAllFiles(Paths.get(dir));
        new engine.simple.Milestone3.TieredIndexWriterWithScore(dir, (double) files.size())
            .buildIndex(se.getIndex());
        QueryFrame.filenames = files.toArray(new String[0]);
        engine.simple.Milestone3.TieredDiskInvertedIndexWithScore idx =
            new engine.simple.Milestone3.TieredDiskInvertedIndexWithScore(dir);
        StringBuilder sb = new StringBuilder("{\n\"files\": [");
        for (int i = 0; i < files.size(); i++) {
            if (i > 0) sb.append(',');
            sb.append(jstr(files.get(i)));
        }
        sb.append("],\n");
        List<String> queries = Files.readAllLines(Paths.get(queriesFile), StandardCharsets.UTF_8);
        for (int qi = 0; qi < queries.size(); qi++) {
            if (qi > 0) sb.append(",\n");
            engine.simple.Milestone3.TieredRankedQueryParserWithScore p =
                new engine.simple.Milestone3.TieredRankedQueryParserWithScore(idx);
            PriorityQueue<Map.Entry<Integer, Double>> pq =
                p.parseQuery(queries.get(qi).toLowerCase().trim(), qi);
            sb.append("\"q").append(qi).append("\": {");
            boolean first = true;
            while (pq != null && !pq.isEmpty()) {
                Map.Entry<Integer, Double> e = pq.poll();
                if (!first) sb.append(',');
                first = false;
                sb.append(jstr(files.get(e.getKey()))).append(":\"")
                  .append(Long.toUnsignedString(Double.doubleToLongBits(e.getValue())))
                  .append('"');
            }
            sb.append('}');
        }
        sb.append("\n}\n");
        Files.write(Paths.get(out), sb.toString().getBytes(StandardCharsets.UTF_8));
    }

    static String jstr(String s) {
        StringBuilder sb = new StringBuilder("\"");
        for (int i = 0; i < s.length(); i++) {
            char c = s.charAt(i);
            if (c == '"' || c == '\\') sb.append('\\').append(c);
            else if (c < 0x20 || (c >= 0x7f && c <= 0x9f) || c > 0xff) {
                sb.append(String.format("\\u%04x", (int) c));
            } else sb.append(c);
        }
        return sb.append('"').toString();
    }
}
