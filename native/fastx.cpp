// FASTQ/FASTA(.gz) parser (host IO native path, the reference's needletail
// role).  Streams the file through zlib and returns concatenated
// sequence/quality/header buffers with offsets; the Python wrapper slices
// them into records.  Built by savont_tpu/ops/native_build.py.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct ParseState {
    std::string seqs, quals, headers;
    std::vector<int64_t> seq_off{0}, qual_off{0}, head_off{0};
    int64_t n_records = 0;
};

// line-buffered gz reader
class GzLines {
  public:
    explicit GzLines(const char* path) : f_(gzopen(path, "rb")) {
        gzbuffer(f_, 1 << 20);
    }
    ~GzLines() {
        if (f_) gzclose(f_);
    }
    bool ok() const { return f_ != nullptr; }
    bool next(std::string& line) {
        line.clear();
        if (!f_) return false;
        char buf[1 << 16];
        while (true) {
            if (gzgets(f_, buf, sizeof(buf)) == nullptr) return !line.empty();
            line += buf;
            if (!line.empty() && line.back() == '\n') {
                line.pop_back();
                if (!line.empty() && line.back() == '\r') line.pop_back();
                return true;
            }
        }
    }

  private:
    gzFile f_;
};

void push(ParseState& st, const std::string& head, const std::string& seq, const std::string& qual) {
    st.headers += head;
    st.head_off.push_back((int64_t)st.headers.size());
    st.seqs += seq;
    st.seq_off.push_back((int64_t)st.seqs.size());
    st.quals += qual;
    st.qual_off.push_back((int64_t)st.quals.size());
    st.n_records++;
}

}  // namespace

extern "C" {

// Parse the file; returns an opaque handle (or nullptr).
void* fastx_parse(const char* path) {
    GzLines gz(path);
    if (!gz.ok()) return nullptr;
    auto* st = new ParseState();
    std::string line;
    if (!gz.next(line)) return st;  // empty file: zero records
    if (!line.empty() && line[0] == '@') {
        // FASTQ
        std::string head, seq, plus, qual;
        while (true) {
            head = line.substr(1);
            if (!gz.next(seq)) break;
            if (!gz.next(plus)) break;
            if (!gz.next(qual)) break;
            push(*st, head, seq, qual);
            if (!gz.next(line)) break;
        }
    } else if (!line.empty() && line[0] == '>') {
        // FASTA
        std::string head = line.substr(1), seq;
        while (gz.next(line)) {
            if (!line.empty() && line[0] == '>') {
                push(*st, head, seq, "");
                head = line.substr(1);
                seq.clear();
            } else {
                seq += line;
            }
        }
        push(*st, head, seq, "");
    } else {
        delete st;
        return nullptr;
    }
    return st;
}

int64_t fastx_n_records(void* h) { return ((ParseState*)h)->n_records; }
const char* fastx_seq_buf(void* h) { return ((ParseState*)h)->seqs.data(); }
const char* fastx_qual_buf(void* h) { return ((ParseState*)h)->quals.data(); }
const char* fastx_head_buf(void* h) { return ((ParseState*)h)->headers.data(); }
const int64_t* fastx_seq_off(void* h) { return ((ParseState*)h)->seq_off.data(); }
const int64_t* fastx_qual_off(void* h) { return ((ParseState*)h)->qual_off.data(); }
const int64_t* fastx_head_off(void* h) { return ((ParseState*)h)->head_off.data(); }
void fastx_free(void* h) { delete (ParseState*)h; }

}  // extern "C"
