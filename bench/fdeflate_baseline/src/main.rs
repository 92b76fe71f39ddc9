//! Measure fdeflate (the reference crate) on the repo's benchmark corpora.
//!
//! Run after `python gen_corpora.py`; prints one JSON object to stdout —
//! vendor it at the repo root as FDEFLATE_BASELINE.json.  See README.md.

use std::collections::BTreeMap;
use std::fs;
use std::path::Path;
use std::time::Instant;

fn best_of<F: FnMut() -> usize>(n: usize, mut f: F) -> (f64, usize) {
    let mut best = f64::INFINITY;
    let mut sink = 0usize;
    for _ in 0..n {
        let t0 = Instant::now();
        sink = f();
        let dt = t0.elapsed().as_secs_f64();
        if dt < best {
            best = dt;
        }
    }
    (best, sink)
}

fn main() {
    let dir = Path::new(env!("CARGO_MANIFEST_DIR")).join("corpora");
    let mut out = BTreeMap::new();
    let mut corpora: Vec<(String, Vec<u8>)> = Vec::new();
    for entry in fs::read_dir(&dir).expect("run gen_corpora.py first") {
        let p = entry.unwrap().path();
        if p.extension().map(|e| e == "bin").unwrap_or(false) {
            let name = p.file_stem().unwrap().to_string_lossy().into_owned();
            corpora.push((name, fs::read(&p).unwrap()));
        }
    }
    corpora.sort_by(|a, b| a.0.cmp(&b.0));

    for (name, data) in &corpora {
        let gb = data.len() as f64 / 1e9;
        let mut sizes = BTreeMap::new();
        let mut enc_gbps = BTreeMap::new();
        for level in 0..=9u8 {
            let c = fdeflate::compress_to_vec_with_level(data, level);
            sizes.insert(level.to_string(), c.len());
            let (t, _) = best_of(5, || {
                fdeflate::compress_to_vec_with_level(data, level).len()
            });
            enc_gbps.insert(level.to_string(), (gb / t * 1000.0).round() / 1000.0);
        }
        let cu = fdeflate::compress_to_vec_ultra_fast(data);
        sizes.insert("ultra".into(), cu.len());
        let (tu, _) = best_of(5, || fdeflate::compress_to_vec_ultra_fast(data).len());
        enc_gbps.insert("ultra".into(), (gb / tu * 1000.0).round() / 1000.0);

        // Decode GB/s of OUTPUT bytes (matching bench.py's convention).
        let c6 = fdeflate::compress_to_vec_with_level(data, 6);
        let (td6, n6) = best_of(5, || fdeflate::decompress_to_vec(&c6).unwrap().len());
        assert_eq!(n6, data.len());
        let (tdu, nu) = best_of(5, || fdeflate::decompress_to_vec(&cu).unwrap().len());
        assert_eq!(nu, data.len());

        let mut entry = BTreeMap::new();
        entry.insert("bytes".to_string(), serde_json::json!(data.len()));
        entry.insert("sizes".to_string(), serde_json::json!(sizes));
        entry.insert("encode_gbps".to_string(), serde_json::json!(enc_gbps));
        entry.insert(
            "decode_gbps_level6".to_string(),
            serde_json::json!((gb / td6 * 1000.0).round() / 1000.0),
        );
        entry.insert(
            "decode_gbps_ultra".to_string(),
            serde_json::json!((gb / tdu * 1000.0).round() / 1000.0),
        );
        out.insert(name.clone(), serde_json::json!(entry));
    }

    let meta = serde_json::json!({
        "crate": "fdeflate",
        "version": "0.3.7",
        "harness": "bench/fdeflate_baseline",
        "note": "single core, best of 5, corpora from gen_corpora.py",
    });
    println!(
        "{}",
        serde_json::json!({"meta": meta, "corpora": out})
    );
}
