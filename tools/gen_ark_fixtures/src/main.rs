//! Generates byte-exactness fixtures for quill-tpu's transcript layer.
//!
//! Run on any machine with cargo:
//!     cargo run --release > ../../tests/fixtures/ark_vectors.json
//!
//! The Python test `tests/test_ark_fixtures.py` activates automatically when
//! the JSON file exists and pins our serialization + transcript against the
//! exact arkworks 0.5 / blake3 behavior the reference uses
//! (/root/reference/transcript/src/transcript.rs).

use ark_bn254::{Fr, G1Projective};
use ark_ec::PrimeGroup;
use ark_ff::PrimeField;
use ark_poly::polynomial::univariate::DensePolynomial;
use ark_poly::DenseUVPolynomial;
use ark_serialize::CanonicalSerialize;
use std::ops::Mul;

fn hex(bytes: &[u8]) -> String {
    bytes.iter().map(|b| format!("{:02x}", b)).collect()
}

fn ser<T: CanonicalSerialize>(x: &T) -> String {
    let mut v = vec![];
    x.serialize_uncompressed(&mut v).unwrap();
    hex(&v)
}

fn main() {
    let mut out = serde_json::Map::new();

    // usize
    out.insert("usize_3".into(), ser(&3usize).into());
    // field elements
    out.insert("fr_0".into(), ser(&Fr::from(0u64)).into());
    out.insert("fr_1".into(), ser(&Fr::from(1u64)).into());
    out.insert("fr_minus_1".into(), ser(&(-Fr::from(1u64))).into());
    out.insert(
        "fr_big".into(),
        ser(&Fr::from_le_bytes_mod_order(&[0xabu8; 48])).into(),
    );
    // vec of field elements
    out.insert(
        "fr_vec".into(),
        ser(&vec![Fr::from(1u64), Fr::from(2u64)]).into(),
    );
    // dense polynomial with trailing zero (stripped by from_coefficients_vec)
    let p = DensePolynomial::from_coefficients_vec(vec![
        Fr::from(5u64),
        Fr::from(0u64),
        Fr::from(7u64),
        Fr::from(0u64),
    ]);
    out.insert("dense_poly".into(), ser(&p).into());
    // G1 points: generator, 2G, -G, identity (projective serialization)
    let g = G1Projective::generator();
    out.insert("g1_gen".into(), ser(&g).into());
    out.insert("g1_2g".into(), ser(&g.double()).into());
    out.insert("g1_neg_g".into(), ser(&(-g)).into());
    out.insert("g1_identity".into(), ser(&(g - g)).into());
    out.insert("g1_7g".into(), ser(&g.mul(Fr::from(7u64))).into());

    // transcript trace: replicate the reference construction exactly
    // (state = blake3(domain); append fr_1; draw 48-byte challenge)
    {
        let mut hasher = blake3::Hasher::new();
        hasher.update(b"fixture_domain");
        let mut state = hasher.finalize().as_bytes().to_vec();
        out.insert("transcript_state0".into(), hex(&state).into());

        let mut msg = vec![];
        Fr::from(1u64).serialize_uncompressed(&mut msg).unwrap();
        let mut h2 = blake3::Hasher::new();
        h2.update(&state);
        h2.update(&msg);
        state = h2.finalize().as_bytes().to_vec();
        out.insert("transcript_state1".into(), hex(&state).into());

        let mut drawer = blake3::Hasher::new();
        drawer.update(&state);
        drawer.update(b"challenge");
        let mut reader = drawer.finalize_xof();
        let mut challenge = vec![0u8; 48];
        reader.fill(&mut challenge);
        out.insert("transcript_challenge".into(), hex(&challenge).into());
        let fe = Fr::from_le_bytes_mod_order(&challenge);
        out.insert("transcript_challenge_fr".into(), ser(&fe).into());
    }

    // corner cases (round-2 verdict item 10).  NOTE: g1_y_half_lo/hi in the
    // Python-derived fixtures use synthetic off-curve pairs to pin the
    // YIsNegative boundary; arkworks types cannot represent those, so this
    // generator emits only the representable subset -- the Python test
    // tolerates their absence from a Rust-generated file.
    {
        let g = G1Projective::generator();
        let pts = vec![g, g - g, g.double()];
        out.insert("g1_vec_with_identity".into(), ser(&pts).into());

        let ff = [0xffu8; 48];
        let mut counting = [0u8; 48];
        for (i, b) in counting.iter_mut().enumerate() {
            *b = i as u8;
        }
        out.insert("fr_from_48_ff_bytes".into(), hex(&ff).into());
        out.insert(
            "fr_from_48_ff".into(),
            ser(&Fr::from_le_bytes_mod_order(&ff)).into(),
        );
        out.insert("fr_from_48_counting_bytes".into(), hex(&counting).into());
        out.insert(
            "fr_from_48_counting".into(),
            ser(&Fr::from_le_bytes_mod_order(&counting)).into(),
        );

        // full transcript replay over every encoder branch
        let append = |state: &mut Vec<u8>, msg: &[u8]| {
            let mut h = blake3::Hasher::new();
            h.update(state);
            h.update(msg);
            *state = h.finalize().as_bytes().to_vec();
        };
        let draw = |state: &mut Vec<u8>| -> Fr {
            let mut h = blake3::Hasher::new();
            h.update(state);
            h.update(b"challenge");
            let mut reader = h.finalize_xof();
            let mut c = vec![0u8; 48];
            reader.fill(&mut c);
            append(state, &c);
            Fr::from_le_bytes_mod_order(&c)
        };
        let mut hasher = blake3::Hasher::new();
        hasher.update(b"replay_domain");
        let mut state = hasher.finalize().as_bytes().to_vec();
        let mut msg = vec![];
        2usize.serialize_uncompressed(&mut msg).unwrap();
        append(&mut state, &msg);
        msg.clear();
        Fr::from(5u64).serialize_uncompressed(&mut msg).unwrap();
        append(&mut state, &msg);
        msg.clear();
        vec![Fr::from(0u64), Fr::from(1u64), -Fr::from(1u64)]
            .serialize_uncompressed(&mut msg)
            .unwrap();
        append(&mut state, &msg);
        msg.clear();
        DensePolynomial::from_coefficients_vec(vec![
            Fr::from(1u64),
            Fr::from(0u64),
            Fr::from(2u64),
            Fr::from(0u64),
        ])
        .serialize_uncompressed(&mut msg)
        .unwrap();
        append(&mut state, &msg);
        let r1 = draw(&mut state);
        msg.clear();
        g.mul(Fr::from(3u64))
            .serialize_uncompressed(&mut msg)
            .unwrap();
        append(&mut state, &msg);
        msg.clear();
        (g - g).serialize_uncompressed(&mut msg).unwrap();
        append(&mut state, &msg);
        let r2 = draw(&mut state);
        out.insert("replay_r1".into(), ser(&r1).into());
        out.insert("replay_r2".into(), ser(&r2).into());
        out.insert("replay_final_state".into(), hex(&state).into());
    }

    println!("{}", serde_json::Value::Object(out));
}
